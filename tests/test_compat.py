"""Spark Connect compatibility shims (r11 verdict #4,
``compat.py``) — unit-level fallback behavior plus an equivalence pin
that an operator computing through the degraded ClosureBroadcast path
produces byte-identical results to the classic torrent-broadcast path.
Mirrors ``test_ensure_parallelism_is_plan_aware``'s philosophy: pin the
degradation from both sides (fallback engages; semantics unchanged)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datawarehouse_vehicule_insurance_spark import compat
from datawarehouse_vehicule_insurance_spark.compat import (
    ClosureBroadcast,
    context_key,
    persistent_rdd_ids,
    safe_broadcast,
    safe_set_log_level,
)


class _NoContextSession:
    """A session facade whose classic bridge is unreachable — what the
    Connect client looks like to these helpers (attribute access on
    ``sparkContext`` raises)."""

    @property
    def sparkContext(self):
        raise AttributeError("sparkContext is not supported in Connect")


class _ConfOnlySession(_NoContextSession):
    class _Conf:
        def get(self, key):
            assert key == "spark.app.id"
            return "app-via-conf-123"

    conf = _Conf()


def test_safe_broadcast_classic_and_fallback(spark):
    real = safe_broadcast(spark, {"a": 1})
    assert real.value == {"a": 1}
    assert not isinstance(real, ClosureBroadcast)
    real.unpersist()

    boxed = safe_broadcast(_NoContextSession(), {"a": 1})
    assert isinstance(boxed, ClosureBroadcast)
    assert boxed.value == {"a": 1}
    boxed.unpersist()  # full Broadcast API surface, all no-ops
    boxed.destroy()


def test_context_key_fallback_chain(spark):
    # classic: the real applicationId
    assert context_key(spark) == spark.sparkContext.applicationId
    # Connect-like with spark.app.id readable via conf
    assert context_key(_ConfOnlySession()) == "app-via-conf-123"
    # last resort: stable per session object within this process
    s = _NoContextSession()
    assert context_key(s) == context_key(s)
    assert context_key(s) != context_key(_NoContextSession())


def test_block_accounting_degrades(spark):
    assert isinstance(persistent_rdd_ids(spark), set)
    assert persistent_rdd_ids(_NoContextSession()) is None

    from datawarehouse_vehicule_insurance_spark.operators.curate import (
        checkpoint_baseline,
        release_checkpoints,
    )

    assert checkpoint_baseline(_NoContextSession()) == set()
    assert release_checkpoints(_NoContextSession(), set()) == 0
    # classic path still live: a checkpoint created after the baseline
    # is found and freed
    base = checkpoint_baseline(spark)
    cut = spark.range(10).localCheckpoint()
    assert cut.count() == 10
    assert release_checkpoints(spark, base) >= 1


def test_safe_set_log_level_degrades(spark):
    safe_set_log_level(spark, "WARN")  # classic: no error
    safe_set_log_level(_NoContextSession(), "WARN")  # Connect: no-op


def test_closure_broadcast_operator_equivalence(spark, monkeypatch):
    """The degraded path is not just non-crashing — it computes the
    SAME answer: IVF assignment over the closure-captured centroids
    equals the classic broadcast run row-for-row."""
    from datawarehouse_vehicule_insurance_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = rng.normal(size=(4, 8))

    classic = sorted(
        S._ivf_assign(df, cents, "vec_id", "embedding")
        .select("vec_id", "__cell")
        .collect()
    )

    monkeypatch.setattr(
        S, "safe_broadcast", lambda _spark, obj: ClosureBroadcast(obj)
    )
    degraded = sorted(
        S._ivf_assign(df, cents, "vec_id", "embedding")
        .select("vec_id", "__cell")
        .collect()
    )
    assert degraded == classic


def test_explain_shuffles_is_documented_classic_only():
    from datawarehouse_vehicule_insurance_spark.operators.scale import (
        explain_shuffles,
    )

    assert "classic" in explain_shuffles.__doc__.lower()
    with pytest.raises(Exception):
        explain_shuffles(_NoContextSession())  # no silent zeros
