"""Unit tests for each hybrid-pool scheduling guard in isolation
(VERDICT r4 #6): fake clocks and synthetic stats, no engine threads.

Guards covered (lbzip2_tpu/codec/encoder.py):
  - take_head drain guard (host-rate x batch-latency vs remaining)
  - take_head outpaced-engine guard (no batch ever landed)
  - take_head half-remainder batch shrink
  - take_claimed steal-back grace window
  - _chip_wait_idle timeout reset + clamped decrement
  - _drain_fetch_q releasing in-flight accounting
"""

import queue
import time

import numpy as np
import pytest

from lbzip2_tpu.codec import encoder as enc
from lbzip2_tpu.ref.rle1 import BlockSpan


def _mk_pool(nblocks=100, use_device=True):
    buf = np.zeros(nblocks * 10, np.uint8)
    blocks = [BlockSpan(i * 10, (i + 1) * 10, buf[i * 10:(i + 1) * 10],
                        np.zeros(256, np.uint8)) for i in range(nblocks)]
    return enc._WorkPool(buf, blocks, 8, host_workers=2,
                         use_device=use_device)


# --- take_head drain guard -----------------------------------------------

def test_drain_guard_refuses_at_stream_tail():
    """Host at 10 blocks/s, device latency 5 s/batch, 30 blocks left:
    the host finishes them in 3 s < one batch round trip, so the
    device must not claim."""
    p = _mk_pool(200)
    p.head, p.tail = 170, 200              # 30 remaining
    p.stats["t0"] = time.time() - 10.0     # elapsed 10 s
    p.stats["host_blocks"] = 100           # host_bps = 10
    p.stats["device_batches"] = [(32, 5.0), (32, 10.0)]
    p.lat_ema = 5.0                        # observed claim->deliver
    assert p.take_head(32) == []


def test_drain_guard_claims_on_deep_queue():
    """Same rates but 900 blocks remaining: the guard must NOT refuse
    (host needs 90 s; the device contributes for many more batches)."""
    p = _mk_pool(1000)
    p.head, p.tail = 100, 1000
    p.stats["t0"] = time.time() - 10.0
    p.stats["host_blocks"] = 100
    p.stats["device_batches"] = [(32, 5.0), (32, 10.0)]
    p.lat_ema = 5.0
    got = p.take_head(32)
    assert len(got) == 32
    assert set(got) <= p.claimed


def test_drain_guard_inactive_when_host_idle():
    """Zero host blocks (host busy elsewhere / just started): rates
    are unknown, the guard must not refuse a deep queue."""
    p = _mk_pool(500)
    p.stats["t0"] = time.time() - 10.0
    p.stats["host_blocks"] = 0
    p.stats["device_batches"] = [(32, 5.0), (32, 10.0)]
    p.lat_ema = 5.0
    assert len(p.take_head(32)) == 32


def test_drain_guard_latency_floor():
    """A freak fast observed latency (0.1 s EMA) must not talk the
    guard into claiming at the drain: the estimate is floored at
    _DRAIN_LAT_FLOOR_S (default 2 s), so with host 20 blocks/s and 40
    remaining the claim is still refused."""
    p = _mk_pool(200)
    p.head, p.tail = 160, 200              # 40 remaining
    p.stats["t0"] = time.time() - 10.0
    p.stats["host_blocks"] = 200           # host_bps = 20
    p.stats["device_batches"] = [(32, 5.0), (32, 5.1)]
    p.lat_ema = 0.1                        # freak fast observation
    # 40 < 32 + 20 * 2.0 -> refuse (with the raw EMA it would claim)
    assert p.take_head(32) == []


# --- take_head outpaced-engine guard -------------------------------------

def test_outpaced_guard_refuses_short_stream():
    """No device batch ever landed and the host already encoded more
    blocks than remain: claims are pure steal-back churn."""
    p = _mk_pool(100)
    p.head, p.tail = 60, 100               # 40 remaining
    p.stats["host_blocks"] = 60
    p.stats["device_batches"] = []
    assert p.take_head(32) == []


def test_outpaced_guard_allows_long_stream():
    p = _mk_pool(1000)
    p.head, p.tail = 0, 1000
    p.stats["host_blocks"] = 60
    p.stats["device_batches"] = []
    assert len(p.take_head(32)) == 32


# --- take_head batch shrink ----------------------------------------------

def test_take_head_half_remainder_shrink():
    p = _mk_pool(40)
    p.head, p.tail = 0, 40                 # 40 < 2*32 -> batch of 8
    assert len(p.take_head(32)) == 8
    p2 = _mk_pool(10)
    p2.head, p2.tail = 0, 10               # 10 < 16 -> half remainder
    assert len(p2.take_head(32)) == 5


def test_take_head_abandoned_pool_claims_nothing():
    p = _mk_pool(100)
    p.abandoned = True
    assert p.take_head(32) == []


# --- take_claimed steal-back grace ---------------------------------------

def test_stealback_blocked_while_streaming_with_tail_work():
    p = _mk_pool(100)
    p.claimed = {5, 9, 2}
    p.last_batch_t = time.time()           # device just delivered
    p.head, p.tail = 10, 90                # tail work available
    assert p.take_claimed() is None


def test_stealback_races_device_on_empty_tail():
    """Empty tail: the host has nothing else to do, racing the device
    is a free win even inside the grace window (first result wins)."""
    p = _mk_pool(100)
    p.claimed = {5, 9, 2}
    p.last_batch_t = time.time()
    p.head = p.tail                        # queue drained
    assert p.take_claimed() == 9           # youngest claim first


def test_stealback_after_grace_expiry():
    p = _mk_pool(100)
    p.claimed = {4, 7}
    p.last_batch_t = time.time() - (enc._STEALBACK_GRACE_S + 1)
    p.head, p.tail = 10, 90
    assert p.take_claimed() == 7


def test_stealback_cold_engine_steals_immediately():
    """last_batch_t == 0 (no batch ever completed): the cold-compile
    window — steal without waiting for the grace period."""
    p = _mk_pool(100)
    p.claimed = {3}
    p.last_batch_t = 0.0
    p.head, p.tail = 10, 90
    assert p.take_claimed() == 3


# --- _chip_wait_idle + _drain_fetch_q ------------------------------------

def test_chip_wait_idle_resets_leaked_counter():
    with enc._chip_cv:
        enc._chip_inflight = 3             # simulated leak
    t0 = time.time()
    enc._chip_wait_idle(timeout_s=0.2)
    assert time.time() - t0 < 2.0
    assert enc._chip_inflight == 0         # reset so the NEXT pool
    enc._chip_wait_idle(timeout_s=5.0)     # ...does not wait at all


def test_chip_dec_clamps_at_zero():
    with enc._chip_cv:
        enc._chip_inflight = 0
    enc._chip_dec()                        # straggler after a reset
    assert enc._chip_inflight == 0


def test_drain_fetch_q_releases_accounting():
    p = _mk_pool(100)
    with enc._chip_cv:
        enc._chip_inflight = 0
    # production order: dispatched items, then pipeline sentinels
    for item in (("a",), ("b",)):
        enc._chip_inc()
        p.fetch_pending += 1
        p.fetch_q.put(item)
    p.fetch_q.put(None)
    p._drain_fetch_q()
    # both items released; the sentinel re-queued for a sibling worker
    assert p.fetch_pending == 0
    assert enc._chip_inflight == 0
    assert p.fetch_q.get_nowait() is None
    with pytest.raises(queue.Empty):
        p.fetch_q.get_nowait()
