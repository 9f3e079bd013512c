import time

from instancediff_tpu.utils.tracing import StepTimer, annotate, device_memory_stats


def test_step_timer_warmup_split():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_s"] >= 0.009
    assert s["warmup_s"] >= 0.009
    assert "p95" in t.message()


def test_annotate_context():
    with annotate("test-phase"):
        pass


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    for v in stats.values():
        assert "bytes_in_use" in v
