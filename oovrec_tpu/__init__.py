"""oovrec_tpu — a TPU-native inductive-OOV recommender framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
snap-research/improving-inductive-oov-recsys (reference: RecBole fork +
`recbole/inductive/` OOV layer; see /root/reference and SURVEY.md).

Design principles (TPU-first, not a port):
  * All device computation is jit-compiled with static shapes: fixed-size
    batches with validity masks, branchless IV/OOV embedding routing via
    `jnp.where`, fixed-round negative resampling instead of rejection loops.
  * Integer ID hashing (3round / fast / 64bit / SipHash for DHE) runs
    vectorized on the host input pipeline in NumPy int64 (bit-exact with the
    reference's torch int64 wraparound semantics) and enters the device as
    plain int32 bucket columns — the device never needs 64-bit emulation.
  * Scaling is mesh-based: `jax.sharding.Mesh` with ('data', 'model') axes,
    batch sharded over 'data', embedding tables row-shardable over 'model'
    (see `oovrec_tpu.parallel`), XLA collectives instead of NCCL.
"""

__version__ = "0.1.0"
