"""Multi-host init hardening: ``maybe_initialize_distributed`` launch shapes.

On a Cloud TPU pod with no env vars, init must still be ATTEMPTED (JAX's
cluster auto-detection finds the topology); silently skipping would leave
every host as process 0 — all of them writing "rank-0" checkpoints. On a
lone TPU VM / tunneled plugin the attempt fails and degrades to
single-process. Mocked-env unit tests for each shape.
"""

import pytest

import ccnet_tpu.parallel.distributed as D
import ccnet_tpu.utils.platform as platform_mod


@pytest.fixture(autouse=True)
def _reset(monkeypatch):
    monkeypatch.setattr(D, "_initialized", False)
    monkeypatch.setattr(D, "_already_initialized", lambda: False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("CCNET_TPU_NO_DISTRIBUTED", raising=False)
    yield


def _mock_initialize(monkeypatch, record, error=None):
    import jax

    def fake(*a, **k):
        record.append((a, k))
        if error is not None:
            raise error

    monkeypatch.setattr(jax.distributed, "initialize", fake)


def test_explicit_coordinator_initializes(monkeypatch):
    calls = []
    _mock_initialize(monkeypatch, calls)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert D.maybe_initialize_distributed() is True
    assert len(calls) == 1


def test_explicit_coordinator_failure_raises(monkeypatch):
    calls = []
    _mock_initialize(monkeypatch, calls, error=RuntimeError("rendezvous failed"))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with pytest.raises(RuntimeError):
        D.maybe_initialize_distributed()


def test_tpu_pod_auto_init_attempted_without_env(monkeypatch):
    """The Cloud-TPU-pod shape: no env vars — initialize() must still be
    attempted (auto-detection), and WITHOUT any prior backend query (a
    jax.devices()/default_backend() call would initialise XLA and make
    initialize() refuse — the pre-check must not exist)."""
    calls = []
    _mock_initialize(monkeypatch, calls)

    def backend_probe():  # a backend query before initialize() is the bug
        raise AssertionError("maybe_initialize_distributed queried the backend")

    monkeypatch.setattr(platform_mod, "is_tpu_backend", backend_probe)
    monkeypatch.setattr(platform_mod, "backend_name", backend_probe)
    assert D.maybe_initialize_distributed() is True
    assert len(calls) == 1


def test_no_cluster_degrades_gracefully(monkeypatch):
    """No cluster metadata (lone TPU VM, tunneled plugin, CPU box): the auto
    attempt raises; degrade to single-process, no exception."""
    calls = []
    _mock_initialize(monkeypatch, calls, error=RuntimeError("no coordinator"))
    assert D.maybe_initialize_distributed() is False
    assert len(calls) == 1


def test_opt_out_env(monkeypatch):
    calls = []
    _mock_initialize(monkeypatch, calls)
    monkeypatch.setenv("CCNET_TPU_NO_DISTRIBUTED", "1")
    assert D.maybe_initialize_distributed() is False
    assert calls == []


def test_already_initialized_short_circuits(monkeypatch):
    calls = []
    _mock_initialize(monkeypatch, calls)
    monkeypatch.setattr(D, "_already_initialized", lambda: True)
    assert D.maybe_initialize_distributed() is True
    assert calls == []
