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
