"""seqalign-tpu: TPU-native all-vs-all pairwise sequence alignment engine.

Package-level JAX configuration (must precede any tracing in submodules):
int64 on device — linear pair ids and triangle tables exceed 2^31 beyond
~65k sequences per bucket, and without x64 JAX silently truncates them to
int32.  All kernel compute dtypes are explicit (int8/int32), so x64 only
affects the id arithmetic that needs it.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)
