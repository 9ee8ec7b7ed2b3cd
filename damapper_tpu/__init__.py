"""damapper_tpu — a TPU-native long-read mapping framework.

A from-scratch reimplementation of the capabilities of Gene Myers' DAMAPPER
(reference: thegenemyers/DAMAPPER) designed TPU-first:

  * data plane      — DAZZ .db/.dam/.las codecs -> columnar numpy/JAX arrays
                      (damapper_tpu.io, parity with reference DB.c / align.c I/O)
  * k-mer index     — vectorized extraction + device sort (damapper_tpu.ops.kmers)
  * seed matching   — sort-merge intersection (damapper_tpu.ops.seeds)
  * chaining        — sweep chain DP (damapper_tpu.ops.chain, native C++ fast path)
  * wave alignment  — O(nd) trace-point wave (damapper_tpu.ops.wave oracle,
                      damapper_tpu.ops.wave_jax batched TPU path)
  * reporting       — LA fusion/chain-graph/zone selection + .las emission
                      (damapper_tpu.pipeline.reporter)
  * distribution    — jax.sharding mesh plans replacing HPC.damapper scripts
                      (damapper_tpu.parallel)
"""

__version__ = "0.1.0"
