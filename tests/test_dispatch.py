"""Host-vs-accelerator dispatch cost model (ops/dispatch.py): the
read-count crossover AND the measured-link gate."""

import os

import pytest

from elprep_tpu.ops import dispatch


@pytest.fixture(autouse=True)
def _reset_link(monkeypatch):
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [None])
    monkeypatch.delenv("ELPREP_TPU_LINK_MBPS", raising=False)
    monkeypatch.delenv("ELPREP_TPU_DEVICE_MIN_READS", raising=False)
    yield


def test_read_count_gate(monkeypatch):
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [10_000.0])  # fast link
    assert not dispatch._columnar_on_accel(1000)
    assert dispatch._columnar_on_accel(dispatch._DEFAULT_MIN_READS)


def test_link_floor_gate(monkeypatch):
    # tunnel-class link: no batch size ever routes columnar to the accel
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [20.0])
    assert not dispatch._columnar_on_accel(1 << 26)
    # PCIe-class link: the read-count crossover is operative
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [10_000.0])
    assert dispatch._columnar_on_accel(1 << 26)


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("ELPREP_TPU_LINK_MBPS", "9999")
    assert dispatch._probe_link_mbps() == 9999.0
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [9999.0])
    monkeypatch.setenv("ELPREP_TPU_DEVICE_MIN_READS", "100")
    assert dispatch._columnar_on_accel(101)
    assert not dispatch._columnar_on_accel(99)


def test_cpu_session_routes_host():
    # the test session is CPU-default: routing must never probe a link
    assert dispatch.routes_to_host(1 << 30)
    assert not dispatch.offloads_to_host(1 << 30)


# -- session PairHMM backend commitment (ops/pairhmm.py) --


@pytest.fixture
def _reset_backend(monkeypatch):
    from elprep_tpu.ops import pairhmm

    monkeypatch.setattr(pairhmm, "_SESSION_BACKEND", [None])
    monkeypatch.delenv("ELPREP_TPU_PAIRHMM_BACKEND", raising=False)
    yield pairhmm


def test_pairhmm_backend_cpu_session_is_scan(_reset_backend):
    # CPU-default session: the jitted lax.scan on the default device
    assert _reset_backend.pairhmm_session_backend() == "scan"


def test_pairhmm_backend_env_override(_reset_backend, monkeypatch):
    monkeypatch.setenv("ELPREP_TPU_PAIRHMM_BACKEND", "pallas")
    assert _reset_backend.pairhmm_session_backend() == "pallas"


def test_pairhmm_backend_healthy_tpu_link(_reset_backend, monkeypatch):
    import jax

    ph = _reset_backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [10_000.0])
    monkeypatch.setattr(dispatch, "_LINK_LATENCY", [0.002])
    assert ph.pairhmm_session_backend() == "pallas"


def test_pairhmm_backend_relay_link_commits_host(_reset_backend, monkeypatch):
    # relay-class latency (BENCH_r04 measured 31 ms at the relay's
    # healthiest and the default session still lost at >=2M reads):
    # the session must commit to the host scan
    import jax

    ph = _reset_backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [10_000.0])
    monkeypatch.setattr(dispatch, "_LINK_LATENCY", [0.03])
    assert ph.pairhmm_session_backend() == "host"
    # tunnel-class bandwidth alone also disqualifies
    ph._SESSION_BACKEND[0] = None
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [135.0])
    monkeypatch.setattr(dispatch, "_LINK_LATENCY", [0.002])
    assert ph.pairhmm_session_backend() == "host"


def test_pairhmm_backend_commitment_is_sticky(_reset_backend, monkeypatch):
    import jax

    ph = _reset_backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dispatch, "_LINK_MBPS", [10_000.0])
    monkeypatch.setattr(dispatch, "_LINK_LATENCY", [0.002])
    assert ph.pairhmm_session_backend() == "pallas"
    # later probe state must NOT flip a committed session (byte equality)
    monkeypatch.setattr(dispatch, "_LINK_LATENCY", [1.5])
    assert ph.pairhmm_session_backend() == "pallas"
    # ... but reset_link_probes (bench tooling) re-decides
    dispatch.reset_link_probes()
    dispatch._LINK_MBPS[0] = 10_000.0
    dispatch._LINK_LATENCY[0] = 1.5
    assert ph.pairhmm_session_backend() == "host"


def test_reset_link_probes_clears_caches(monkeypatch):
    from elprep_tpu.ops import pairhmm

    dispatch._LINK_MBPS[0] = 123.0
    dispatch._LINK_LATENCY[0] = 0.5
    pairhmm._SESSION_BACKEND[0] = "host"
    dispatch.reset_link_probes()
    assert dispatch._LINK_MBPS[0] is None
    assert dispatch._LINK_LATENCY[0] is None
    assert pairhmm._SESSION_BACKEND[0] is None
