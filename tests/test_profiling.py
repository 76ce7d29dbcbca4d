"""Throughput meter + train-driver chunk bookkeeping (utils/profiling.py).

The headline rays/s number is produced by SteadyStateMeter +
chunk_schedule; these tests prove the arithmetic exactly (VERDICT r2
item 6): full coverage of [start, num_iters), boundary placement, the
first-sync compile exclusion, and resume-with-remainder walks.
"""

import itertools

from nerf_simple_tpu.utils.profiling import (
    SteadyStateMeter,
    Throughput,
    chunk_schedule,
)


def test_throughput_accumulates_and_rates():
    m = Throughput()
    m.tick(10, 40960)
    m.tick(5, 20480)
    assert m.iters == 15
    assert m.rays == 61440
    # pin the clock: pretend the window opened 10 s ago
    import time

    m.t0 = time.perf_counter() - 10.0
    assert abs(m.iters_per_sec - 1.5) < 0.01
    assert abs(m.rays_per_sec - 6144.0) < 10.0
    m.reset()
    assert m.iters == 0 and m.rays == 0


def test_steady_state_meter_excludes_first_sync():
    m = SteadyStateMeter(rays_per_iter=4096)
    m.sync(40)  # first sync: compile window, excluded
    assert m.iters == 0
    m.sync(100)
    assert m.iters == 60
    m.sync(160)
    assert m.iters == 120
    assert m.meter.rays == 120 * 4096


def test_steady_state_meter_invariant_under_any_sync_pattern():
    """After any monotone sync sequence: iters == last - first."""
    syncs = [7, 7 + 20, 7 + 110, 7 + 113, 7 + 400]
    m = SteadyStateMeter(rays_per_iter=1)
    for s in syncs:
        m.sync(s)
    assert m.iters == syncs[-1] - syncs[0]


def test_steady_state_meter_discard_warmup():
    m = SteadyStateMeter(rays_per_iter=8)
    m.sync(20)
    m.sync(40)
    m.discard_warmup()
    assert m.iters == 0
    m.sync(60)  # becomes the new baseline
    m.sync(100)
    assert m.iters == 40


def _walk(start, num_iters, spc, everys):
    return list(chunk_schedule(start, num_iters, spc, everys))


def test_chunk_schedule_covers_every_iteration_once():
    for start, num_iters, spc in [
        (0, 100, 20),
        (0, 105, 20),
        (37, 105, 20),
        (0, 7, 20),
        (99, 100, 20),
        (0, 100, 1),
    ]:
        chunks = _walk(start, num_iters, spc, (10,))
        iters = list(
            itertools.chain.from_iterable(
                range(cs, cs + n) for cs, n, _ in chunks
            )
        )
        assert iters == list(range(start, num_iters)), (start, num_iters, spc)
        # all chunks full-size except possibly the last
        assert all(n == spc for _, n, _ in chunks[:-1])


def test_chunk_schedule_empty_when_done():
    assert _walk(100, 100, 20, (10,)) == []
    assert _walk(120, 100, 20, (10,)) == []


def test_chunk_schedule_boundaries():
    # cadence 50, chunks of 20 from 0..100: hits at iters 0, 50, 100(excl)
    chunks = _walk(0, 100, 20, (50,))
    bounds = [b for _, _, b in chunks]
    # chunk [0,20) contains 0 -> True; [20,40) no; [40,60) contains 50 ->
    # True; [60,80) no; [80,100) is last -> True
    assert bounds == [True, False, True, False, True]
    # last chunk is always a boundary (final losses must be drained)
    assert _walk(0, 40, 20, (1000,))[-1][2] is True


def test_chunk_schedule_multiple_cadences():
    chunks = _walk(0, 60, 20, (30, 45))
    bounds = [b for _, _, b in chunks]
    # [0,20): 0%30==0 True; [20,40): 30 True; [40,60): 45 + last True
    assert bounds == [True, True, True]


def test_chunk_schedule_resume_with_remainder():
    """A resume at step 73 of a 100-iter run with spc=20: chunks cover
    [73, 100) with one 7-iter remainder, and the meter over the walk
    reports exactly total-minus-first-chunk iterations."""
    chunks = _walk(73, 100, 20, (10,))
    assert [(cs, n) for cs, n, _ in chunks] == [(73, 20), (93, 7)]
    m = SteadyStateMeter(rays_per_iter=4096)
    done = 0
    for cs, n, boundary in chunks:
        done = cs + n - 73
        if boundary:
            m.sync(done)
    # first boundary chunk (20 iters, includes compile) excluded
    assert m.iters == (100 - 73) - 20
    assert m.meter.rays == m.iters * 4096
