"""Headless tests for the GUI's worker->UI protocol and result browser.

The tkinter widgets can't run without a display, but the queue protocol
and the per-image result store (`coastline.cli.gui.ResultStore` /
`drain_queue`) are plain Python — the parts the reference gets wrong
(unguarded cross-thread GUI mutation, `predict_coastline.py:848-1544`'s
result list) are exactly the parts tested here.
"""

import queue

from coastline.cli.gui import ImageQueue, ResultStore, drain_queue


def _mk_result(tag):
    return {"water_mask": tag, "coastline_mask": tag}


def test_drain_queue_routes_messages_and_fills_store():
    q = queue.Queue()
    store = ResultStore()
    seen = {"status": [], "ready": 0, "results": [], "done": 0}

    q.put(("status", "loading model…"))
    q.put(("ready", None))
    q.put(("result", (0, "/a/one.png", _mk_result("r0"))))
    q.put(("result", (1, "/a/two.png", None)))  # failed extraction
    q.put(("result", (2, "/a/three.png", _mk_result("r2"))))
    q.put(("done", None))

    n = drain_queue(
        q, store,
        on_status=seen["status"].append,
        on_ready=lambda: seen.__setitem__("ready", seen["ready"] + 1),
        on_result=lambda i, idx, p, r: seen["results"].append((i, idx, p)),
        on_done=lambda: seen.__setitem__("done", seen["done"] + 1),
    )

    assert n == 6
    assert seen["status"] == ["loading model…"]
    assert seen["ready"] == 1
    assert seen["done"] == 1
    # store keeps every attempted image in order, including the failure
    assert len(store) == 3
    assert seen["results"] == [(0, 0, "/a/one.png"), (1, 1, "/a/two.png"),
                               (2, 2, "/a/three.png")]


def test_result_store_selection_and_labels():
    store = ResultStore()
    store.add("/data/alpha.png", _mk_result("a"))
    store.add("/data/beta.png", None)
    store.add("/data/gamma.png", _mk_result("g"))

    labels = store.labels()
    assert labels[0] == "alpha.png"
    assert labels[1] == "beta.png  (failed)"
    assert labels[2] == "gamma.png"

    # selecting any past result re-retrieves it (the reference's
    # re-viewable result list behavior)
    path, result = store.get(0)
    assert path == "/data/alpha.png" and result["water_mask"] == "a"
    path, result = store.get(2)
    assert result["coastline_mask"] == "g"

    # only successes are saveable
    assert [r["water_mask"] for r in store.saveable()] == ["a", "g"]

    store.clear()
    assert len(store) == 0 and store.labels() == []


def test_drain_queue_empty_is_noop():
    q = queue.Queue()
    store = ResultStore()
    assert drain_queue(q, store) == 0
    assert len(store) == 0


def test_image_queue_list_management():
    """The reference GUI's input-list operations
    (`predict_coastline.py:1201-1277`): de-dup add, reorder, remove,
    clear — as pure index math on ImageQueue."""
    iq = ImageQueue()
    iq.add(["/d/a.png", "/d/b.png"])
    iq.add(["/d/b.png", "/d/c.png"])  # duplicate b is dropped
    assert iq.paths == ["/d/a.png", "/d/b.png", "/d/c.png"]
    assert iq.labels() == ["a.png", "b.png", "c.png"]

    assert iq.move_up(2) == 1  # c above b
    assert iq.paths == ["/d/a.png", "/d/c.png", "/d/b.png"]
    assert iq.move_up(0) == 0  # clamped at top
    assert iq.move_down(2) == 2  # clamped at bottom
    assert iq.move_down(None) is None  # no selection is a no-op
    assert iq.move_down(0) == 1
    assert iq.paths == ["/d/c.png", "/d/a.png", "/d/b.png"]

    iq.remove(1)
    assert iq.paths == ["/d/c.png", "/d/b.png"]
    iq.remove(None)  # no selection is a no-op
    assert len(iq) == 2
    iq.set(["/d/z.png"])
    assert iq.paths == ["/d/z.png"]
    iq.clear()
    assert len(iq) == 0 and iq.labels() == []


def test_result_store_prev_next_navigation():
    """Prev/next browsing is clamped at the ends (reference
    `predict_coastline.py:1279-1307`) and defined from no selection."""
    store = ResultStore()
    assert store.prev_index(None) is None  # empty store: nothing to show
    assert store.next_index(None) is None
    for i, p in enumerate(["/r/0.png", "/r/1.png", "/r/2.png"]):
        store.add(p, _mk_result(str(i)))

    assert store.next_index(None) == 0  # from unselected: land on first
    assert store.prev_index(None) == 2  # from unselected: land on last
    assert store.next_index(0) == 1 and store.next_index(1) == 2
    assert store.next_index(2) == 2  # clamped
    assert store.prev_index(2) == 1 and store.prev_index(1) == 0
    assert store.prev_index(0) == 0  # clamped
