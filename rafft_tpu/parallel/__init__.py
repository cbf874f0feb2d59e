"""Scale-out: device meshes and data-parallel benchmark sweeps.

The fold workload is embarrassingly parallel across sequences (the
reference fans out one subprocess per sequence via multiprocessing.Pool,
/root/reference/benchmark_results/bench_fft.py:17-21).  The TPU-native
equivalent shards the batch axis of the fold engine across a
('data',)-axis device mesh: no collectives are needed in the fold inner
loop, so throughput scales linearly over ICI-connected chips and across
hosts (multi-controller jax.distributed).
"""
