"""Point-to-point host transport: a TCP socket mesh between processes.

The reference's map synchronization is built on ``MPI_Alltoallv``
(``ref:src/toast/pixels.py:878-970``), whose defining property is that a
process RECEIVES only the bytes addressed to it.  The
``jax.distributed`` host channel exposes only allgather-shaped
collectives, where every payload is replicated to all P processes —
fine for metadata, catastrophic for bulk map exchange (receive volume
P x the hit volume).  This module provides the missing primitive: a
persistent, lazily-established full mesh of TCP connections between the
JAX processes, with a generalized pairwise ``alltoallv`` over it.

Address exchange (host, port) rides the tiny allgather; all bulk bytes
flow directly between the two endpoints.  Connections persist across
calls, so per-iteration syncs pay only the payload.
"""

from __future__ import annotations

import socket
import struct
import threading

from ..utils.logging import Logger

_HDR = struct.Struct(">Q")


class SocketMesh:
    """Full mesh of persistent TCP connections between world processes."""

    _instance = None
    _instance_key = None

    @classmethod
    def get(cls, comm):
        """Singleton per (world_size, world_rank) layout."""
        key = (comm.world_size, comm.world_rank)
        if cls._instance is None or cls._instance_key != key:
            cls._instance = cls(comm)
            cls._instance_key = key
        return cls._instance

    def __init__(self, comm):
        self._rank = comm.world_rank
        self._size = comm.world_size
        self._lock = threading.Lock()
        self._conns: dict[int, socket.socket] = {}
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind(("", 0))
        self._listener.listen(self._size)
        port = self._listener.getsockname()[1]
        host = _routable_host()
        # tiny metadata allgather: (host, port) per process
        self._addrs = comm.allgather((host, port))
        self._establish()

    def _establish(self):
        """Build the mesh: accept from lower ranks, connect to higher.

        Connect-to-higher runs in a thread while the main thread accepts,
        so the two sides of every edge progress concurrently — no
        ordering deadlock.
        """
        expected_in = self._rank  # ranks 0..rank-1 connect to us
        errors = []

        def _connect_up():
            for peer in range(self._rank + 1, self._size):
                try:
                    s = socket.create_connection(
                        self._addrs[peer], timeout=60
                    )
                    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                    s.sendall(_HDR.pack(self._rank))
                    with self._lock:
                        self._conns[peer] = s
                except Exception as e:  # pragma: no cover - network failure
                    errors.append((peer, e))

        t = threading.Thread(target=_connect_up, daemon=True)
        t.start()
        self._listener.settimeout(60)
        for _ in range(expected_in):
            s, _addr = self._listener.accept()
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            peer = _HDR.unpack(_recv_exact(s, _HDR.size))[0]
            with self._lock:
                self._conns[int(peer)] = s
        t.join(timeout=120)
        if errors:
            raise RuntimeError(f"socket mesh connect failed: {errors}")
        missing = [
            p for p in range(self._size)
            if p != self._rank and p not in self._conns
        ]
        if missing:
            raise RuntimeError(f"socket mesh incomplete, missing {missing}")

    def alltoallv(self, send: dict[int, bytes]) -> dict[int, bytes]:
        """Exchange one bytes payload with every peer (empty if absent).

        Returns {peer: payload}.  Sends run on background threads while
        the main thread receives from all peers, so arbitrarily large
        payloads cannot deadlock the blocking sockets.
        """
        with self._lock:
            conns = dict(self._conns)

        def _send_to(peer):
            payload = send.get(peer, b"")
            c = conns[peer]
            c.sendall(_HDR.pack(len(payload)))
            if payload:
                c.sendall(payload)

        threads = []
        for peer in conns:
            t = threading.Thread(target=_send_to, args=(peer,), daemon=True)
            t.start()
            threads.append(t)
        out = {}
        for peer, c in conns.items():
            n = _HDR.unpack(_recv_exact(c, _HDR.size))[0]
            out[peer] = _recv_exact(c, int(n)) if n else b""
        for t in threads:
            t.join()
        return out

    def close(self):
        for c in self._conns.values():
            try:
                c.close()
            except OSError:
                pass
        self._conns.clear()
        try:
            self._listener.close()
        except OSError:
            pass
        if SocketMesh._instance is self:
            SocketMesh._instance = None
            SocketMesh._instance_key = None


def _recv_exact(sock, n):
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:], n - got)
        if r == 0:
            raise ConnectionError("socket mesh peer closed")
        got += r
    return bytes(buf)


def _routable_host():
    """This host's address as seen by peers.

    ``TOAST_P2P_HOST`` overrides; otherwise the address used to reach the
    jax.distributed coordinator (or a UDP-probe default route), falling
    back to the hostname.
    """
    import os

    override = os.environ.get("TOAST_P2P_HOST")
    if override:
        return override
    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        coord = os.environ.get("TOAST_COORDINATOR", "8.8.8.8:80")
        chost, _, cport = coord.partition(":")
        probe.connect((chost, int(cport or 80)))
        return probe.getsockname()[0]
    except OSError:
        return socket.gethostbyname(socket.gethostname())
    finally:
        probe.close()


def mesh_available(comm):
    """Try to build (or fetch) the socket mesh; None if unavailable."""
    try:
        return SocketMesh.get(comm)
    except Exception as e:  # pragma: no cover - restricted environments
        Logger.get().warning(
            f"socket mesh unavailable ({e}); falling back to allgather "
            "transport"
        )
        return None
