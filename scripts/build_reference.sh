#!/usr/bin/env bash
# Build the ACTUAL reference binary (jakovdev/SequenceAligner) in this image.
#
# The reference needs gcc>=13 (C23 `constexpr`, `auto`, `nullptr`,
# keyword `bool`/`alignof`/`static_assert`) and libhdf5 dev headers; this
# image has gcc 12 and no HDF5. The gap is mechanical:
#   - copy the source tree to a scratch dir (never modify /root/reference)
#   - rewrite `constexpr T N = V;` declarations to `#define N ((T)(V))`
#     (C `const` is not an integer constant expression, so -Dconstexpr=const
#     fails at array dimensions)
#   - map `auto` -> GNU `__auto_type`, `nullptr` -> ((void*)0)
#   - force-include stdbool/stdalign/assert for the C23 keywords
#   - satisfy <hdf5.h> with native/hdf5_stub/hdf5.h, which dumps full-mode
#     H5Dwrite payloads to <output>.rawdump for bit-parity checks
#
# Usage: scripts/build_reference.sh [outdir]   (default /tmp/refbuild)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference
OUT="${1:-/tmp/refbuild}"
SRC="$OUT/src_patched"

mkdir -p "$OUT"
rm -rf "$SRC"
mkdir -p "$SRC"
cp -r "$REF/src" "$REF/third_party" "$SRC/"

find "$SRC/src" "$SRC/third_party" \( -name '*.h' -o -name '*.c' \) -print0 |
  xargs -0 sed -i -E 's/^([[:space:]]*)constexpr ([a-z_0-9]+) ([A-Za-z_0-9]+) = (.*);/\1#define \3 ((\2)(\4))/'
sed -i 's/#define ALIGN_KERNEL(FN) constexpr void \*FN = nullptr/#define ALIGN_KERNEL(FN) static void *const FN = ((void*)0)/' \
  "$SRC/src/bio/align.h"

gcc -std=c2x -O3 -march=native -funroll-loops -fopenmp -D_GNU_SOURCE \
  -include stdbool.h -include stdalign.h -include assert.h \
  -I "$SRC/src" -I "$SRC/third_party/clix" -I "$REPO/native/hdf5_stub" \
  -D auto=__auto_type -D 'nullptr=((void*)0)' \
  "$SRC"/src/main.c "$SRC"/src/bio/*.c "$SRC"/src/bio/method/*.c \
  "$SRC"/src/interface/seqalign_cuda.c "$SRC"/src/io/*.c \
  "$SRC"/src/io/source/*.c "$SRC"/src/io/format/hdf5.c \
  "$SRC"/src/system/os.c "$SRC"/src/util/*.c \
  -o "$OUT/seqalign_ref" -lm

echo "built: $OUT/seqalign_ref"
