"""vgan_tpu — a TPU-native pangenome analysis engine.

A from-scratch reimplementation of the capabilities of grenaud/vgan
(HaploCart, euka, soibean, keelime, gam2prof, duprm) designed for
JAX/XLA/Pallas on TPU:

* graph + read data live as packed device arrays,
* per-read x per-path likelihoods are dense matmuls against a
  node-to-path support bitmatrix (MXU),
* per-base probability models (ancient-DNA damage, sequencing error,
  HKY85) are vectorized element-wise passes (VPU),
* MCMC samplers are `lax.scan` loops with chains vmapped and sharded
  across devices,
* read batches shard data-parallel over a `jax.sharding.Mesh`
  with `psum`/`allgather` reductions over ICI.

Reference behavior is documented per-module with `file:line` citations
into the vgan source tree.
"""

__version__ = "0.1.0"

# The reference accumulates likelihoods in `long double`
# (`src/HaploCart.cpp:297`); we keep float64 available on every backend
# for the precision-critical reductions (f32/bf16 stay the default for
# throughput kernels, which request their dtypes explicitly).
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# The axon remote compiler takes minutes for the MCMC scan programs;
# a persistent compilation cache makes that a one-time cost per shape.
_cache_dir = _os.environ.get(
    "VGAN_TPU_JAX_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "vgan_tpu", "jax"),
)
if _cache_dir:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # 1s: on the axon tunnel even small programs cost tens of seconds
    # to compile remotely, so cache everything non-trivial
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
