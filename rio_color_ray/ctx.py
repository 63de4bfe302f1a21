"""Ray Data execution-context tuning for this engine.

Shuffle strategy — measured on this sandbox (32-CPU local node, sf0.1
corpus, warm workers; see BASELINE.md "shuffle strategy" table):

* sort-shuffle (pull-based, Ray's default): task-based exchange that
  reuses warm worker processes. Tile groupby 3.3s, aggregates 1.6-2.7s,
  per-execution overhead of a full pipeline ~2s.
* hash-shuffle: spawns a fresh pool of aggregator ACTORS per dataset
  execution (library import + process start before the first block
  moves), adding ~2s per exchange per run; aggregates 4.3-5.2s. It also
  deadlocks small nodes unless the per-partition CPU reservation is cut
  to a fraction (aggregators at 1 CPU each can hold every core while
  upstream map tasks starve).

With stateful stages running task-pool (stages/statecache.py) and the
tile assembly vectorized over Arrow, sort-shuffle wins every exchange in
this engine at every scale we can measure here, so we pin it explicitly.
On a long-lived multi-node deployment where aggregator pools amortize,
flip ``shuffle_strategy`` to HASH_SHUFFLE and raise
``max_hash_shuffle_aggregators`` to ~ total_cores/4; every groupby in
this codebase already passes a hash-partition count via
``num_partitions=shuffle_partitions()`` (accepted by both strategies).
"""

from ray.data.context import DataContext, ShuffleStrategy


def tune_data_context():
    """Idempotent: pin the measured-fastest exchange configuration."""
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    # guard-rails for anyone flipping to HASH_SHUFFLE (see module docs):
    # fractional aggregator CPUs avoid small-node scheduling deadlock,
    # and a bounded aggregator count caps per-execution process spawn.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.1
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.1
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.1
    ctx.default_hash_shuffle_parallelism = 8
    ctx.max_hash_shuffle_aggregators = 8
    return ctx


def shuffle_partitions(cap=64, floor=8):
    """Partition count for a keyed exchange: ≈ cluster CPUs, bounded.

    At cluster scale raise ``cap`` with the node count; the floor keeps
    small local runs from collapsing to one reducer.
    """
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", floor))
            return max(floor, min(cap, cpus))
    except Exception:
        pass
    return max(floor, min(cap, 32))
