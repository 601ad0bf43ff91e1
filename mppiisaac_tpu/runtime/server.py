"""Minimal TCP RPC adapter — the optional world↔planner process split.

The reference REQUIRES two processes joined by zerorpc/ZeroMQ because Isaac
Gym cannot host two sims in one process (`/root/reference`
`docs/source/structure.rst:37`; server at `examples/panda/planner.py:46-48`).
This framework runs single-process by default (runtime/loop.py), but keeps a
wire adapter so external simulators / real-robot bridges written against the
reference's RPC surface (`compute_action_tensor`, `get_rollouts`,
`update_weights`, `update_mppi_params`, `add_to_env` — `mppi_isaac.py:107-137`)
can drive this planner over TCP.

Protocol: 4-byte big-endian length + pickled (method, args, kwargs) request,
4-byte length + pickled (ok, payload) response. Tensor arguments ride as the
reference's `torch.save` bytes (runtime/transport.py is wire-compatible).
Bind/connect strings accept zerorpc-style "tcp://host:port".

Trust model: pickle over a loopback/lab link, same as the reference's
zerorpc+msgpack setup — do not expose to untrusted networks.
"""
from __future__ import annotations

import pickle
import socket
import struct
import threading
from typing import Any

_LEN = struct.Struct(">I")


def _parse_endpoint(ep: str):
    if ep.startswith("tcp://"):
        ep = ep[len("tcp://"):]
    host, _, port = ep.rpartition(":")
    return host or "0.0.0.0", int(port)


def _send_msg(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj, protocol=4)
    sock.sendall(_LEN.pack(len(data)) + data)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def _recv_msg(sock: socket.socket) -> Any:
    (n,) = _LEN.unpack(_recv_exact(sock, 4))
    return pickle.loads(_recv_exact(sock, n))


class Server:
    """`Server(planner).bind("tcp://0.0.0.0:4242").run()` — shape parity with
    the reference's zerorpc server usage."""

    def __init__(self, obj: Any):
        self.obj = obj
        self._sock: socket.socket | None = None
        self._stop = threading.Event()

    def bind(self, endpoint: str) -> "Server":
        host, port = _parse_endpoint(endpoint)
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind((host, port))
        s.listen(8)
        self._sock = s
        return self

    @property
    def port(self) -> int:
        return self._sock.getsockname()[1]

    def _serve_conn(self, conn: socket.socket):
        try:
            while not self._stop.is_set():
                try:
                    method, args, kwargs = _recv_msg(conn)
                except ConnectionError:
                    break
                try:
                    result = getattr(self.obj, method)(*args, **kwargs)
                    _send_msg(conn, (True, result))
                except Exception as e:  # report remote errors like zerorpc
                    import traceback

                    _send_msg(
                        conn,
                        (False, f"{type(e).__name__}: {e}\n{traceback.format_exc()}"),
                    )
        finally:
            conn.close()

    def run(self):
        """Blocking accept loop (the reference's planner.run())."""
        assert self._sock is not None, "bind() first"
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                break
            threading.Thread(target=self._serve_conn, args=(conn,), daemon=True).start()

    def run_in_thread(self) -> threading.Thread:
        t = threading.Thread(target=self.run, daemon=True)
        t.start()
        return t

    def stop(self):
        self._stop.set()
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass


class Client:
    """`c = Client(); c.connect("tcp://127.0.0.1:4242"); c.compute_action_tensor(...)`"""

    def __init__(self):
        self._sock: socket.socket | None = None
        self._lock = threading.Lock()

    def connect(self, endpoint: str) -> "Client":
        host, port = _parse_endpoint(endpoint)
        self._sock = socket.create_connection((host if host != "0.0.0.0" else "127.0.0.1", port))
        return self

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)

        def call(*args, **kwargs):
            with self._lock:
                _send_msg(self._sock, (name, args, kwargs))
                ok, payload = _recv_msg(self._sock)
            if not ok:
                raise RuntimeError(f"remote error: {payload}")
            return payload

        return call

    def close(self):
        if self._sock is not None:
            self._sock.close()
