"""Driver-crossover routing guard — the shared probe behind every
small-relation driver path in the engine.

Several operators route bounded-size relations to a driver-side
algorithm because the distributed loop's per-job scheduling latency
dominates below a threshold (measured: ~6 s of pure stage scheduling
for an 84k-edge connected-components graph; 2.7 s -> 0.5 s for a 200k-
vector k-center loop). The crossover CONTRACT every such site must
satisfy:

1. **Bounded memory by construction** — the cap times the row payload
   must be a driver-safe byte budget (document the arithmetic at the
   call site), and the transfer should be Arrow/flat-column where the
   rows are numerous (5M Row objects cost ~an order of magnitude more
   than two flat long columns).
2. **Bit-identical results** — the driver twin must reproduce the
   distributed path's floating-point fold order, rounding, and tie
   rules exactly, pinned by a test that runs BOTH paths (force the
   distributed one with cap=0).
3. **Distributed fallback mandatory** — above the cap the operator
   must keep working without the driver; the guard routes, it never
   errors.
4. **Cheap probe** — size is probed with ``limit(cap+1).count()``,
   O(cap) rows regardless of relation size, never a full count().

Sites: ``dedup.connected_components`` (union-find under the edge cap),
``sampling.kcenter_select`` (greedy loop under the vector cap),
``streaming.ann_bridge.batch_ivf_topk`` (query matmul under the query
cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def within_driver_bound(df: DataFrame, cap: int) -> bool:
    """True iff ``df`` has at most ``cap`` rows — the crossover probe.

    Costs one job over at most ``cap + 1`` rows: the count aggregates
    a GlobalLimit, so execution stops as soon as cap+1 rows surface —
    a corpus-sized relation never pays a full count to learn it is
    over the bound (plan shape pinned by
    ``test_routing.test_probe_plan_is_limit_bounded``)."""
    return df.limit(int(cap) + 1).count() <= int(cap)
