"""Tagged host messaging (parallel/messages.py) vs the reference's MPI
message-metadata surface (core_mpi.hpp:277-350, 503-637)."""

import threading

import pytest

from mara3_tpu.parallel import messages as M


@pytest.fixture
def pair():
    # ephemeral ports; exchange the OS-assigned addresses after binding
    a = M.Mailbox(0, 2, [("127.0.0.1", 0), ("127.0.0.1", 0)])
    b = M.Mailbox(1, 2, [("127.0.0.1", 0), ("127.0.0.1", 0)])
    a.addresses[1] = b.addresses[1]
    b.addresses[0] = a.addresses[0]
    yield a, b
    a.close()
    b.close()


def test_status_metadata_and_dynamic_size(pair):
    a, b = pair
    a.send(b"hello cloud", dest=1, tag=7)
    st = b.probe(timeout=10)
    assert not st.is_null()
    assert st.count() == 11           # bytes, like MPI_CHAR counts
    assert st.source() == 0
    assert st.tag() == 7
    # receive without knowing the size beforehand
    assert b.recv(source=0, tag=7, timeout=10) == b"hello cloud"
    # queue drained
    assert b.iprobe().is_null()


def test_iprobe_null_and_any_wildcards(pair):
    a, b = pair
    assert a.iprobe().is_null()
    assert a.iprobe().count() == 0
    assert a.iprobe().source() == -1
    assert a.iprobe().tag() == -1
    b.send(b"x" * 257, dest=0, tag=3)
    st = a.probe(M.ANY_SOURCE, M.ANY_TAG, timeout=10)
    assert (st.count(), st.source(), st.tag()) == (257, 1, 3)


def test_tag_and_source_filtering(pair):
    a, b = pair
    b.send(b"t1", dest=0, tag=1)
    b.send(b"t2", dest=0, tag=2)
    a.probe(tag=2, timeout=10)
    # tag filter skips the tag-1 message even though it arrived first
    assert a.recv(tag=2, timeout=10) == b"t2"
    assert a.recv(tag=1, timeout=10) == b"t1"
    # source filter: nothing from rank 0 queued at a
    assert a.iprobe(source=0).is_null()


def test_irecv_isend_requests(pair):
    a, b = pair
    # irecv before anything is pending: null request (reference semantics)
    r = b.irecv()
    assert r.is_null()
    req = a.isend(b"payload", dest=1, tag=9)
    req.wait()
    assert req.test()
    b.probe(tag=9, timeout=10)
    r2 = b.irecv(tag=9)
    assert not r2.is_null()
    assert r2.get() == b"payload"


def test_typed_get_deserializer_hook(pair):
    """Request.get(deserialize) = mpi::Request::get<T>
    (core_mpi.hpp:234-268): typed values out of the completion handle."""
    import json
    import pickle

    import numpy as np
    a, b = pair
    a.isend(json.dumps({"n": 3}).encode(), dest=1, tag=1).wait()
    a.isend(pickle.dumps((1, "two")), dest=1, tag=2).wait()
    a.isend(np.arange(4, dtype=np.int64).tobytes(), dest=1, tag=3).wait()
    b.probe(tag=1, timeout=10)
    assert b.irecv(tag=1).get(lambda r: json.loads(r)) == {"n": 3}
    b.probe(tag=2, timeout=10)
    assert b.irecv(tag=2).get(pickle.loads) == (1, "two")
    b.probe(tag=3, timeout=10)
    got = b.irecv(tag=3).get(lambda r: np.frombuffer(r, np.int64))
    assert (got == np.arange(4)).all()


def test_strings_round_trip_and_fifo(pair):
    a, b = pair
    for i in range(5):
        a.send(f"msg{i}", dest=1, tag=0)
    got = [b.recv(source=0, tag=0, timeout=10).decode() for _ in range(5)]
    assert got == [f"msg{i}" for i in range(5)]


def test_bidirectional_threads(pair):
    a, b = pair

    def pong():
        msg = b.recv(tag=11, timeout=10)
        b.send(msg[::-1], dest=0, tag=12)

    th = threading.Thread(target=pong)
    th.start()
    a.send(b"abcdef", dest=1, tag=11)
    assert a.recv(tag=12, timeout=10) == b"fedcba"
    th.join()
