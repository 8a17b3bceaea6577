"""Native C++ scheduler vs the pure-Python twin (identical trace semantics)."""

import pytest

from sgl_kernel_npu_tpu.runtime import NativeScheduler, PyScheduler, make_scheduler


def _trace(sched):
    log = []
    r1 = sched.add_request([1, 2, 3, 4, 5, 6, 7, 8, 9], max_new_tokens=3)
    r2 = sched.add_request([1, 2, 3, 4, 9, 9], max_new_tokens=2)
    log.append(("free0", sched.free_pages()))

    # simulate steps
    for step in range(8):
        entries = sched.schedule_step()
        log.append(("step", step, [(e["kind"], e["start"], e["len"]) for e in entries]))
        for e in entries:
            sched.commit_progress(e["req_id"], e["kind"], e["len"])
    # page alloc + prefix cache
    pages = sched.alloc_pages(2)
    log.append(("alloc", tuple(pages)))
    sched.insert_prefix([1, 2, 3, 4, 5, 6, 7, 8], pages)
    n, hit = sched.match_prefix([1, 2, 3, 4, 5, 6, 7, 8, 100])
    log.append(("match", n, tuple(hit)))
    n2, hit2 = sched.match_prefix([1, 2, 3, 4, 50])
    log.append(("match_partial", n2, tuple(hit2)))
    sched.finish_request(r1)
    sched.finish_request(r2)
    log.append(("end_reqs", sched.num_requests()))
    return log


def test_native_builds():
    s = make_scheduler(16, 4)
    assert s.free_pages() == 16


def test_native_matches_python_twin():
    try:
        native = NativeScheduler(16, 4, max_batch=8, token_budget=6)
    except RuntimeError:
        pytest.skip("no native toolchain")
    py = PyScheduler(16, 4, max_batch=8, token_budget=6)
    assert _trace(native) == _trace(py)


def test_refcounted_prefix_pages():
    py = PyScheduler(8, 4)
    pages = py.alloc_pages(1)
    py.insert_prefix([1, 2, 3, 4], pages)   # refcount 2
    py.release_pages(pages)                  # refcount 1 (cache holds it)
    assert py.free_pages() == 7              # page NOT returned
    n, hit = py.match_prefix([1, 2, 3, 4])
    assert n == 4 and hit == pages


def test_chunked_prefill_budget():
    py = PyScheduler(32, 4, token_budget=5)
    py.add_request(list(range(12)), 1)
    e1 = py.schedule_step()
    assert e1 == [{"req_id": 1, "kind": "prefill", "start": 0, "len": 5}]
    py.commit_progress(1, "prefill", 5)
    e2 = py.schedule_step()
    assert e2[0]["start"] == 5 and e2[0]["len"] == 5
    py.commit_progress(1, "prefill", 5)
    py.commit_progress(1, "prefill", 2)  # after third chunk
    e4 = py.schedule_step()
    assert e4[0]["kind"] == "decode" and e4[0]["start"] == 12


@pytest.mark.parametrize("impl", ["native", "python"])
def test_radix_lru_eviction(impl):
    """Exhausting the pool evicts least-recently-used cache-only pages; pages
    pinned by live requests survive."""
    sched = make_scheduler(6, 4, prefer_native=(impl == "native"))
    if impl == "native" and isinstance(sched, PyScheduler):
        pytest.skip("no native toolchain")

    # two cached prefixes: A (older) and B (newer)
    pa = sched.alloc_pages(2)
    sched.insert_prefix([1, 2, 3, 4, 5, 6, 7, 8], pa)
    sched.release_pages(pa)                 # cache is now the only holder
    pb = sched.alloc_pages(2)
    sched.insert_prefix([9, 10, 11, 12, 13, 14, 15, 16], pb)
    sched.release_pages(pb)
    assert sched.free_pages() == 2

    # allocating 4 pages: 2 from free + 2 evicted. LRU order evicts ALL of A
    # (leaf chain: evicting the tail chunk exposes the head) and spares B.
    got = sched.alloc_pages(4)
    assert len(got) == 4
    m_a, _ = sched.match_prefix([1, 2, 3, 4, 5, 6, 7, 8])
    m_b, _ = sched.match_prefix([9, 10, 11, 12, 13, 14, 15, 16])
    assert m_a == 0
    assert m_b == 8
    sched.release_pages(got)

    # a RETAINED prefix never gets evicted
    pc = sched.alloc_pages(2)
    sched.insert_prefix([21, 22, 23, 24, 25, 26, 27, 28], pc)
    # request keeps its pages retained (refcount 2: request + cache)
    got = sched.alloc_pages(4)              # drains pool + evicts B remnants
    m_c, pages_c = sched.match_prefix([21, 22, 23, 24, 25, 26, 27, 28])
    assert m_c == 8 and pages_c == pc
