"""Multi-chip / multi-host scale-out (TPU-native surface).

The reference has no parallelism of any kind (SURVEY.md section 2.3); this
layer is new TPU-native capability mandated by the north star: corpus shards
data-parallel over a ``jax.sharding.Mesh``, merge/rank tables replicated in
HBM, and token/byte counters reduced with ``psum`` collectives over ICI.
"""
