"""Shared driver-crossover guard (operators.routing.within_driver_bound):
boundary behavior and the cheap-probe plan contract (the guard itself
must be a limit-bounded job, never a full count of a corpus-sized
relation)."""

from __future__ import annotations

from redshift_to_pendo_api_data_pipeline_spark.operators.routing import within_driver_bound


def test_boundary_semantics(spark):
    df = spark.range(100)
    assert within_driver_bound(df, 100)       # exactly at cap -> driver
    assert not within_driver_bound(df, 99)    # one over -> distributed
    assert within_driver_bound(spark.range(0), 0)


def test_probe_plan_is_limit_bounded(spark):
    # the probe's aggregate must sit over a GlobalLimit: execution
    # stops after cap+1 rows surface, so an over-cap corpus never pays
    # a full count to learn it routes distributed
    df = spark.range(10_000_000)
    plan = (
        df.limit(101)._jdf.queryExecution().executedPlan().toString()
    )
    assert "GlobalLimit" in plan or "CollectLimit" in plan


def test_three_sites_share_the_guard():
    # the contract doc lives in one place; the three crossover sites
    # must actually route through it (a hand-rolled probe drifts —
    # r10's counted the mirrored edge relation and silently halved
    # the documented capacity)
    import inspect

    from redshift_to_pendo_api_data_pipeline_spark.operators import dedup, sampling
    from redshift_to_pendo_api_data_pipeline_spark.streaming import ann_bridge

    for mod, fn in [
        (dedup, "connected_components"),
        (sampling, "kcenter_select"),
        (ann_bridge, "batch_ivf_topk"),
    ]:
        src = inspect.getsource(getattr(mod, fn))
        assert "within_driver_bound" in src, f"{fn} does not use the guard"
