"""Host-side tagged messaging: the control plane of mpi::Communicator.

Redesign of the message-metadata surface of the reference's MPI wrapper
(/root/reference/src/core_mpi.hpp — Status :277-350, probe/iprobe/recv/
irecv :503-637, send/isend :415-500, any_source/any_tag :360-368). The
data plane of this framework is compiled SPMD collectives
(parallel/collectives.py), where message shapes are static and nothing
arrives unexpectedly — which is exactly why that redesign could not
express the reference's *dynamic* host messaging: probing for messages of
unknown size, source, or tag, and reading their metadata from a Status.

This module supplies that surface with a TCP mailbox per process: a
background acceptor thread files incoming frames into an in-order queue,
and probe/iprobe/recv match on (source, tag) exactly as MPI does, with
``Status.count()`` reporting the byte count of the matched message (the
reference counts in MPI_CHAR units, i.e. bytes). Payloads are ``bytes``,
mirroring the reference's ``std::string`` messages; serialization of
structured values belongs to app/serialize.py, as it does upstream.

Rendezvous: each rank listens on ``addresses[rank]``; the default is
``(host, base_port + rank)`` on localhost, which matches how this repo's
multi-process tests spawn workers. Pass explicit ``addresses`` for
anything else.
"""

from __future__ import annotations

import socket
import struct
import threading
from collections import deque
from typing import List, Optional, Sequence, Tuple

ANY_SOURCE = -1
ANY_TAG = -1

_HEADER = struct.Struct("<iiI")  # source, tag, nbytes
_DEFAULT_BASE_PORT = 29870


class Status:
    """Message metadata (core_mpi.hpp:277-350). Default-constructed means
    null — e.g. what iprobe returns when no message is pending."""

    __slots__ = ("_null", "_count", "_source", "_tag")

    def __init__(self, count: int = 0, source: int = -1, tag: int = -1,
                 null: bool = True):
        self._null = null
        self._count = count
        self._source = source
        self._tag = tag

    def is_null(self) -> bool:
        return self._null

    def count(self) -> int:
        """Byte count of the message (MPI_Get_count with MPI_CHAR)."""
        return 0 if self._null else self._count

    def source(self) -> int:
        return -1 if self._null else self._source

    def tag(self) -> int:
        return -1 if self._null else self._tag

    def __repr__(self):
        if self._null:
            return "Status(null)"
        return (f"Status(count={self._count}, source={self._source}, "
                f"tag={self._tag})")


class Request:
    """Completion handle for isend/irecv (core_mpi.hpp:160-270). A
    default-constructed request is null; ``get()`` on a receive request
    returns the payload."""

    def __init__(self, thread: Optional[threading.Thread] = None,
                 result: Optional[list] = None):
        self._thread = thread
        self._result = result if result is not None else []

    def is_null(self) -> bool:
        return self._thread is None and not self._result

    def test(self) -> bool:
        if self._thread is None:
            return bool(self._result)
        return not self._thread.is_alive()

    def wait(self):
        if self._thread is not None:
            self._thread.join()

    def get(self, deserialize=None):
        """Block until complete and return the payload (b'' for sends).

        ``deserialize`` is the typed-payload hook — the analog of
        ``mpi::Request::get<T>`` (core_mpi.hpp:234-268) returning a
        value instead of bytes. Any callable taking the raw bytes
        works; e.g. ``req.get(pickle.loads)``, ``req.get(json.loads)``,
        or ``lambda b: np.frombuffer(b, dtype)``."""
        self.wait()
        raw = self._result[0] if self._result else b""
        return deserialize(raw) if deserialize is not None else raw

    def cancel(self):
        """Cancel-and-null the request (mpi::Request cancel-on-drop,
        core_mpi.hpp:160-175). A completed request's payload is dropped;
        an in-flight send thread is detached (socket sends cannot be
        recalled, matching MPI_Cancel's best-effort semantics for sends).
        After cancel() the request is null."""
        self._thread = None
        self._result = []


def default_addresses(size: int, host: str = "127.0.0.1",
                      base_port: int = _DEFAULT_BASE_PORT
                      ) -> List[Tuple[str, int]]:
    return [(host, base_port + r) for r in range(size)]


class Mailbox:
    """Per-process tagged mailbox. One instance per rank; thread-safe."""

    def __init__(self, rank: int, size: int,
                 addresses: Optional[Sequence[Tuple[str, int]]] = None,
                 base_port: int = _DEFAULT_BASE_PORT):
        self.rank = rank
        self.size = size
        self.addresses = (list(addresses) if addresses is not None
                          else default_addresses(size, base_port=base_port))
        if len(self.addresses) != size:
            raise ValueError("need one address per rank")
        self._queue: deque = deque()   # (source, tag, payload) in order
        self._cond = threading.Condition()
        self._closed = False
        self._out: dict = {}           # dest -> (socket, lock); persistent
        self._out_lock = threading.Lock()
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind(self.addresses[rank])
        # port 0 = ephemeral: record the OS-assigned port so callers can
        # exchange real addresses after construction
        self.addresses[rank] = (self.addresses[rank][0],
                                self._listener.getsockname()[1])
        self._listener.listen(2 * size + 8)
        self._acceptor = threading.Thread(target=self._accept_loop,
                                          daemon=True)
        self._acceptor.start()

    # ---- receiving side --------------------------------------------------

    def _accept_loop(self):
        while True:
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return                      # listener closed
            threading.Thread(target=self._read_one, args=(conn,),
                             daemon=True).start()

    def _read_one(self, conn: socket.socket):
        """Drain frames from one peer connection; a single reader per
        connection preserves per-sender FIFO order (MPI non-overtaking)."""
        try:
            while True:
                header = self._read_exactly(conn, _HEADER.size)
                if header is None:
                    return
                source, tag, nbytes = _HEADER.unpack(header)
                payload = self._read_exactly(conn, nbytes)
                if payload is None:
                    return
                with self._cond:
                    self._queue.append((source, tag, payload))
                    self._cond.notify_all()
        finally:
            conn.close()

    @staticmethod
    def _read_exactly(conn: socket.socket, n: int) -> Optional[bytes]:
        buf = bytearray()
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return bytes(buf)

    def _match(self, source: int, tag: int, pop: bool):
        """First queued message matching (source, tag); FIFO like MPI's
        matching order for a given (source, tag) pair."""
        for i, (s, t, payload) in enumerate(self._queue):
            if source not in (ANY_SOURCE, s):
                continue
            if tag not in (ANY_TAG, t):
                continue
            if pop:
                del self._queue[i]
            return s, t, payload
        return None

    # ---- the reference surface ------------------------------------------

    def iprobe(self, source: int = ANY_SOURCE, tag: int = ANY_TAG) -> Status:
        """Non-blocking probe: null Status when nothing matches
        (core_mpi.hpp:517-531)."""
        with self._cond:
            hit = self._match(source, tag, pop=False)
        if hit is None:
            return Status()
        s, t, payload = hit
        return Status(len(payload), s, t, null=False)

    def probe(self, source: int = ANY_SOURCE, tag: int = ANY_TAG,
              timeout: Optional[float] = None) -> Status:
        """Blocking probe (core_mpi.hpp:503-511). ``timeout`` (seconds) is
        an extension for tests; None blocks indefinitely."""
        with self._cond:
            while True:
                hit = self._match(source, tag, pop=False)
                if hit is not None:
                    s, t, payload = hit
                    return Status(len(payload), s, t, null=False)
                if self._closed:
                    raise OSError("mailbox closed")
                if not self._cond.wait(timeout=timeout):
                    raise TimeoutError("probe timed out")

    def recv(self, source: int = ANY_SOURCE, tag: int = ANY_TAG,
             timeout: Optional[float] = None) -> bytes:
        """Blocking receive of a message of *unknown size* — probe first,
        then take the payload (core_mpi.hpp:536-546)."""
        with self._cond:
            while True:
                hit = self._match(source, tag, pop=True)
                if hit is not None:
                    return hit[2]
                if self._closed:
                    raise OSError("mailbox closed")
                if not self._cond.wait(timeout=timeout):
                    raise TimeoutError("recv timed out")

    def irecv(self, source: int = ANY_SOURCE, tag: int = ANY_TAG) -> Request:
        """Non-blocking receive: a null Request when nothing is pending
        (the reference's irecv iprobes first, core_mpi.hpp:554-580)."""
        with self._cond:
            hit = self._match(source, tag, pop=True)
        if hit is None:
            return Request()
        return Request(result=[hit[2]])

    def _connection(self, dest: int):
        with self._out_lock:
            entry = self._out.get(dest)
            if entry is None:
                conn = socket.create_connection(self.addresses[dest],
                                                timeout=30)
                entry = (conn, threading.Lock())
                self._out[dest] = entry
        return entry

    def send(self, data, dest: int, tag: int = 0):
        """Blocking tagged send of bytes/str (core_mpi.hpp:415-436). All
        sends to one destination share a persistent connection, so
        same-(source, tag) messages arrive in send order."""
        payload = data.encode() if isinstance(data, str) else bytes(data)
        conn, lock = self._connection(dest)
        with lock:
            conn.sendall(_HEADER.pack(self.rank, tag, len(payload))
                         + payload)

    def isend(self, data, dest: int, tag: int = 0) -> Request:
        """Non-blocking send (core_mpi.hpp:446-470)."""
        th = threading.Thread(target=self.send, args=(data, dest, tag),
                              daemon=True)
        th.start()
        return Request(thread=th)

    def close(self):
        with self._cond:
            self._closed = True
            self._cond.notify_all()   # wake blocked recv/probe callers
        try:
            self._listener.close()
        except OSError:
            pass
        with self._out_lock:
            for conn, _ in self._out.values():
                try:
                    conn.close()
                except OSError:
                    pass
            self._out.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
