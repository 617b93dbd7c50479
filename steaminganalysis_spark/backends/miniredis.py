"""Pure-Python mini-Redis: a RESP2 TCP server + minimal client.

VERDICT r4 order #3: no redis-server binary, no ``redis`` package, no
network to fetch either — but the *protocol* needs no install. This
module stands up a single-node Redis replacement speaking real RESP2
over a real socket, implementing exactly the command surface the
KV sink uses (reference parity: CommonUtil.scala:39-49's Jedis calls):

    PING GET SET SETNX DEL HINCRBY HGETALL TYPE SCAN
    SCRIPT LOAD  EVALSHA  EVAL  FLUSHALL

EVAL/EVALSHA execute the PRODUCTION Lua script
(``steaminganalysis_spark.streaming.sinks._APPLY_BATCH_LUA``) through
the in-repo Lua-5.1-subset interpreter
(``steaminganalysis_spark.backends.luasim``), under the server's
global command lock — the same atomicity a real Redis gives scripts.

``MiniRedisClient`` implements the slice of the ``redis.Redis`` API
that ``RedisKVStore`` consumes (``from_url``, ``ping``, ``get``,
``setnx``, ``hincrby``, ``hgetall``, ``scan_iter``,
``register_script``), so the sink code is byte-identical whether it
talks to this server or a real one.

Scale note: this is a test/sandbox backend. On a real deployment the
same ``RedisKVStore`` binds to redis-py against a production server;
nothing in the hot sink path (one EVAL per micro-batch carrying the
pre-aggregated per-day deltas, O(days) not O(rows)) changes.
"""

from __future__ import annotations

import hashlib
import socket
import socketserver
import threading

from steaminganalysis_spark.backends.luasim import LuaScriptRunner

__all__ = ["MiniRedisServer", "MiniRedisClient"]

_WRONG_TYPE = "WRONGTYPE Operation against a key holding the wrong kind of value"


# --------------------------------------------------------------------------
# RESP2 encoding / decoding (shared by server and client)
# --------------------------------------------------------------------------


def _encode_command(args: list[str]) -> bytes:
    """Client→server: an array of bulk strings."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = a.encode() if isinstance(a, str) else bytes(a)
        out.append(b"$%d\r\n%s\r\n" % (len(b), b))
    return b"".join(out)


def _encode_reply(v) -> bytes:
    """Server→client: map Python values onto RESP2 reply types."""
    if isinstance(v, _Error):
        return b"-%s\r\n" % v.message.encode()
    if isinstance(v, bool):  # Lua true/false → :1 / nil (Redis semantics)
        return b":1\r\n" if v else b"$-1\r\n"
    if isinstance(v, int):
        return b":%d\r\n" % v
    if isinstance(v, float):  # Lua numbers come back as doubles
        return b":%d\r\n" % int(v)
    if v is None:
        return b"$-1\r\n"
    if isinstance(v, str):
        b = v.encode()
        return b"$%d\r\n%s\r\n" % (len(b), b)
    if isinstance(v, _Simple):
        return b"+%s\r\n" % v.text.encode()
    if isinstance(v, (list, tuple)):
        return b"*%d\r\n" % len(v) + b"".join(_encode_reply(x) for x in v)
    raise TypeError(f"unencodable reply: {v!r}")


class _Simple:
    """Marker for a RESP simple-string reply (+OK vs bulk)."""

    def __init__(self, text: str) -> None:
        self.text = text


class _Error:
    def __init__(self, message: str) -> None:
        self.message = message


class _Reader:
    """Incremental RESP2 parser over a socket (blocking)."""

    def __init__(self, sock: socket.socket) -> None:
        self._sock = sock
        self._buf = b""

    def _read_line(self) -> bytes | None:
        while b"\r\n" not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                return None  # peer closed
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n + 2:  # payload + trailing \r\n
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed mid-bulk")
            self._buf += chunk
        data, self._buf = self._buf[:n], self._buf[n + 2 :]
        return data

    def read_value(self):
        """One RESP value; None ⇔ connection closed at a boundary."""
        line = self._read_line()
        if line is None:
            return None
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest.decode()
        if kind == b"-":
            raise ResponseError(rest.decode())
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            if n == -1:
                return _NIL
            return self._read_exact(n).decode()
        if kind == b"*":
            n = int(rest)
            if n == -1:
                return _NIL
            out = []
            for _ in range(n):
                v = self.read_value()
                if v is None:
                    raise ConnectionError("peer closed mid-array")
                out.append(v)
            return out
        raise ResponseError(f"protocol error: unknown type byte {kind!r}")


class ResponseError(Exception):
    """Server sent a -ERR reply (mirrors redis.exceptions.ResponseError)."""


class _Nil:
    """Sentinel distinguishing RESP nil from a closed connection."""

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "<nil>"


_NIL = _Nil()


# --------------------------------------------------------------------------
# Server
# --------------------------------------------------------------------------


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # one connection, many commands
        reader = _Reader(self.request)
        server: MiniRedisServer = self.server.owner  # type: ignore[attr-defined]
        while True:
            try:
                cmd = reader.read_value()
            except (ConnectionError, OSError):
                return
            if cmd is None:
                return
            if not isinstance(cmd, list) or not cmd:
                reply = _Error("ERR protocol error: expected command array")
            else:
                reply = server.dispatch([str(a) for a in cmd])
            try:
                self.request.sendall(_encode_reply(reply))
            except OSError:
                return


class _TCPServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class MiniRedisServer:
    """Threaded RESP2 server bound to 127.0.0.1 on an ephemeral port.

    All commands run under one lock — single-threaded command
    execution, exactly Redis's concurrency model, which is what makes
    EVAL atomic without MULTI/EXEC.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self._rt = LuaScriptRunner()  # strings + hashes keyspace & EVAL
        self._scripts: dict[str, str] = {}
        self._mu = threading.Lock()
        self._tcp = _TCPServer((host, port), _Handler)
        self._tcp.owner = self  # type: ignore[attr-defined]
        self.host, self.port = self._tcp.server_address[:2]
        self._thread = threading.Thread(
            target=self._tcp.serve_forever, name="miniredis", daemon=True
        )

    # -- lifecycle -----------------------------------------------------
    def start(self) -> "MiniRedisServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()

    def __enter__(self) -> "MiniRedisServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def url(self) -> str:
        return f"redis://{self.host}:{self.port}/0"

    # -- command dispatch ----------------------------------------------
    def dispatch(self, argv: list[str]):
        with self._mu:
            try:
                return self._dispatch_locked(argv)
            except ResponseError as e:
                return _Error(str(e))
            except Exception as e:  # surface, never crash the server
                return _Error(f"ERR {type(e).__name__}: {e}")

    def _dispatch_locked(self, argv: list[str]):
        cmd, args = argv[0].upper(), argv[1:]
        strings, hashes = self._rt.strings, self._rt.hashes
        if cmd == "PING":
            return _Simple("PONG")
        if cmd == "SELECT":  # single logical db; accept and ignore index
            return _Simple("OK")
        if cmd == "FLUSHALL":
            strings.clear()
            hashes.clear()
            return _Simple("OK")
        if cmd == "GET":
            if args[0] in hashes:
                raise ResponseError(_WRONG_TYPE)
            return strings.get(args[0])
        if cmd == "SET":
            strings[args[0]] = args[1]
            return _Simple("OK")
        if cmd == "SETNX":
            if args[0] in strings:
                return 0
            strings[args[0]] = args[1]
            return 1
        if cmd == "DEL":
            n = 0
            for k in args:
                n += (strings.pop(k, None) is not None) + (hashes.pop(k, None) is not None)
            return n
        if cmd == "HINCRBY":
            if args[0] in strings:
                raise ResponseError(_WRONG_TYPE)
            h = hashes.setdefault(args[0], {})
            h[args[1]] = h.get(args[1], 0) + int(args[2])
            return h[args[1]]
        if cmd == "HGETALL":
            out: list[str] = []
            for f, v in hashes.get(args[0], {}).items():
                out += [f, str(v)]
            return out
        if cmd == "TYPE":
            if args[0] in hashes:
                return _Simple("hash")
            if args[0] in strings:
                return _Simple("string")
            return _Simple("none")
        if cmd == "SCAN":
            return self._scan(args)
        if cmd == "SCRIPT":
            if args and args[0].upper() == "LOAD":
                sha = hashlib.sha1(args[1].encode()).hexdigest()
                self._scripts[sha] = args[1]
                return sha
            raise ResponseError(f"ERR Unknown SCRIPT subcommand {args[:1]}")
        if cmd == "EVALSHA":
            script = self._scripts.get(args[0].lower())
            if script is None:
                raise ResponseError("NOSCRIPT No matching script")
            return self._eval(script, args[1:])
        if cmd == "EVAL":
            return self._eval(args[0], args[1:])
        raise ResponseError(f"ERR unknown command '{cmd}'")

    def _scan(self, args: list[str]):
        # Positional cursor over the key pool re-derived per page
        # (strings then hashes). A real Redis cursor is a reverse-bit
        # iterator with an at-least-once guarantee under concurrent
        # mutation; this index cursor only guarantees full coverage
        # when the keyspace is not mutated between pages — fine for
        # the single-threaded drain-after-batch callers here.
        cursor = int(args[0])
        match, type_filter, count = "*", None, 10
        i = 1
        while i < len(args):
            opt = args[i].upper()
            if opt == "MATCH":
                match, i = args[i + 1], i + 2
            elif opt == "TYPE":
                type_filter, i = args[i + 1].lower(), i + 2
            elif opt == "COUNT":
                count, i = int(args[i + 1]), i + 2
            else:
                raise ResponseError(f"ERR syntax error near '{args[i]}'")
        if type_filter == "hash":
            pool = list(self._rt.hashes)
        elif type_filter == "string":
            pool = list(self._rt.strings)
        else:
            pool = list(self._rt.strings) + list(self._rt.hashes)
        import fnmatch

        window = pool[cursor : cursor + count]
        matched = [k for k in window if fnmatch.fnmatchcase(k, match)]
        next_cursor = cursor + count
        return [str(next_cursor if next_cursor < len(pool) else 0), matched]

    def _eval(self, script: str, args: list[str]):
        nkeys = int(args[0])
        keys, argv = args[1 : 1 + nkeys], args[1 + nkeys :]
        # LuaScriptRunner.eval takes its own lock; we already hold the
        # command lock, which is the real atomicity boundary here.
        return self._rt.eval(script, keys=list(keys), argv=list(argv))


# --------------------------------------------------------------------------
# Client — the redis.Redis subset RedisKVStore consumes
# --------------------------------------------------------------------------


class _Script:
    """redis-py Script-object twin: EVALSHA with NOSCRIPT→EVAL fallback."""

    def __init__(self, client: "MiniRedisClient", script: str) -> None:
        self._client = client
        self._script = script
        self.sha = hashlib.sha1(script.encode()).hexdigest()

    def __call__(self, keys=(), args=()):
        keys, args = list(keys), [str(a) for a in args]
        try:
            return self._client.execute_command(
                "EVALSHA", self.sha, str(len(keys)), *keys, *args
            )
        except ResponseError as e:
            if not str(e).startswith("NOSCRIPT"):
                raise
            self.sha = self._client.execute_command("SCRIPT", "LOAD", self._script)
            return self._client.execute_command(
                "EVALSHA", self.sha, str(len(keys)), *keys, *args
            )


class MiniRedisClient:
    """Socket client speaking RESP2, API-compatible (subset) with
    ``redis.Redis(decode_responses=True)``. One connection, one lock —
    callers here are the foreachBatch driver thread."""

    def __init__(self, host: str, port: int) -> None:
        self._sock = socket.create_connection((host, port))
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._reader = _Reader(self._sock)
        self._mu = threading.Lock()

    @classmethod
    def from_url(cls, url: str, decode_responses: bool = True) -> "MiniRedisClient":
        # redis://host:port/db — db index accepted and ignored (single db)
        rest = url.split("://", 1)[1]
        hostport = rest.split("/", 1)[0]
        host, _, port = hostport.rpartition(":")
        return cls(host or "127.0.0.1", int(port))

    def execute_command(self, *args: str):
        with self._mu:
            self._sock.sendall(_encode_command([str(a) for a in args]))
            v = self._reader.read_value()
        if v is None:
            raise ConnectionError("miniredis server closed the connection")
        return None if v is _NIL else v

    def close(self) -> None:
        self._sock.close()

    # -- the RedisKVStore surface ---------------------------------------
    def ping(self) -> bool:
        return self.execute_command("PING") == "PONG"

    def get(self, key: str):
        return self.execute_command("GET", key)

    def set(self, key: str, value: str) -> bool:
        return self.execute_command("SET", key, str(value)) == "OK"

    def setnx(self, key: str, value: str) -> int:
        return self.execute_command("SETNX", key, str(value))

    def hincrby(self, key: str, field: str, delta: int) -> int:
        return self.execute_command("HINCRBY", key, field, str(int(delta)))

    def hgetall(self, key: str) -> dict[str, str]:
        flat = self.execute_command("HGETALL", key)
        return dict(zip(flat[::2], flat[1::2]))

    def scan_iter(self, match: str = "*", _type: str | None = None):
        cursor = "0"
        while True:
            cmd = ["SCAN", cursor, "MATCH", match]
            if _type:
                cmd += ["TYPE", _type]
            cursor, keys = self.execute_command(*cmd)
            yield from keys
            if cursor == "0":
                break

    def register_script(self, script: str) -> _Script:
        self.execute_command("SCRIPT", "LOAD", script)
        return _Script(self, script)
