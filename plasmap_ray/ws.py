"""RFC 6455 WebSocket framing, stdlib-only — the wire layer that makes
``plasmap_ray serve --ws`` a REAL WebSocket server (S13 parity with the
reference's akka-http upgrade endpoint, WSServer.scala:43-71: GET +
``Upgrade: websocket`` -> 101 Switching Protocols -> framed messages).

Scope: server side of the protocol over a blocking socket pair of
file-like streams — the subset a query-serving loop needs:

- opening handshake (Sec-WebSocket-Accept = b64(sha1(key + GUID)));
- client->server frames are MASKED text frames (possibly fragmented:
  opcode 0x1 then 0x0 continuations until FIN), plus ping/pong/close
  control frames;
- server->client frames are unmasked; one JSON document per text
  frame (the reference's chunked TextMessage analogue is the paged
  response envelope, cli._result_payload).

No external deps (``websockets``/``wsproto`` are not in this
environment); ~150 lines of struct packing is the whole protocol at
this feature level.
"""

from __future__ import annotations

import base64
import hashlib
import struct

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(sec_websocket_key: str) -> str:
    """RFC 6455 §4.2.2 step 5.4: the Sec-WebSocket-Accept value."""
    digest = hashlib.sha1((sec_websocket_key.strip() + WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def read_handshake(rfile) -> dict | None:
    """Read the client's HTTP upgrade request (CRLF-terminated header
    block) and return its headers (lower-cased names) plus
    ``_request_line``; None on EOF before a full header block."""
    line = rfile.readline()
    if not line:
        return None
    headers: dict = {"_request_line": line.decode("latin-1").strip()}
    while True:
        raw = rfile.readline()
        if not raw:
            return None
        s = raw.decode("latin-1").strip()
        if not s:
            return headers
        if ":" in s:
            k, v = s.split(":", 1)
            headers[k.strip().lower()] = v.strip()


def handshake_response(headers: dict) -> bytes:
    """101 response bytes for a valid upgrade request, or a 400
    response if the required upgrade headers are missing."""
    key = headers.get("sec-websocket-key")
    upgrade = headers.get("upgrade", "").lower()
    if not key or upgrade != "websocket":
        return b"HTTP/1.1 400 Bad Request\r\nContent-Length: 28\r\n\r\nNot a WebSocket handshake.\r\n"
    return (
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept_key(key)}\r\n"
        "\r\n"
    ).encode("ascii")


def encode_frame(payload: bytes, opcode: int = OP_TEXT, fin: bool = True) -> bytes:
    """Server->client frame (unmasked, RFC 6455 §5.2)."""
    b0 = (0x80 if fin else 0) | (opcode & 0x0F)
    n = len(payload)
    if n < 126:
        header = struct.pack("!BB", b0, n)
    elif n < 1 << 16:
        header = struct.pack("!BBH", b0, 126, n)
    else:
        header = struct.pack("!BBQ", b0, 127, n)
    return header + payload


def encode_text(text: str) -> bytes:
    return encode_frame(text.encode("utf-8"), OP_TEXT)


def encode_close(code: int = 1000) -> bytes:
    return encode_frame(struct.pack("!H", code), OP_CLOSE)


def _read_exact(rfile, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = rfile.read(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def read_frame(rfile) -> tuple[int, bytes, bool] | None:
    """One raw frame: (opcode, unmasked payload, fin); None on EOF."""
    head = _read_exact(rfile, 2)
    if head is None:
        return None
    b0, b1 = head
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        ext = _read_exact(rfile, 2)
        if ext is None:
            return None
        n = struct.unpack("!H", ext)[0]
    elif n == 127:
        ext = _read_exact(rfile, 8)
        if ext is None:
            return None
        n = struct.unpack("!Q", ext)[0]
    mask = b""
    if masked:
        mask = _read_exact(rfile, 4)
        if mask is None:
            return None
    payload = _read_exact(rfile, n) if n else b""
    if payload is None:
        return None
    if masked and n:
        # vectorless unmask is fine: control frames are <=125 B and a
        # query AST is tiny; int.from_bytes tricks only matter at MBs
        payload = bytes(c ^ mask[i & 3] for i, c in enumerate(payload))
    return opcode, payload, fin


def read_message(rfile, wfile) -> str | None:
    """Next complete TEXT message (reassembling continuations),
    answering pings with pongs along the way (RFC 6455 §5.5.2-5.5.3).
    Returns None on close frame or EOF."""
    parts: list[bytes] = []
    while True:
        frame = read_frame(rfile)
        if frame is None:
            return None
        opcode, payload, fin = frame
        if opcode == OP_CLOSE:
            try:
                wfile.write(encode_close())
                wfile.flush()
            except OSError:
                pass
            return None
        if opcode == OP_PING:
            wfile.write(encode_frame(payload, OP_PONG))
            wfile.flush()
            continue
        if opcode == OP_PONG:
            continue
        if opcode in (OP_TEXT, OP_BINARY) or (opcode == OP_CONT and parts):
            parts.append(payload)
            if fin:
                return b"".join(parts).decode("utf-8")


def mask_client_frame(payload: bytes, opcode: int = OP_TEXT, mask: bytes = b"\x12\x34\x56\x78") -> bytes:
    """Client->server frame builder (MASKED — RFC 6455 §5.1 requires
    it of clients).  Exists for the pytest client; the server never
    sends masked frames."""
    b0 = 0x80 | (opcode & 0x0F)
    n = len(payload)
    if n < 126:
        header = struct.pack("!BB", b0, 0x80 | n)
    elif n < 1 << 16:
        header = struct.pack("!BBH", b0, 0x80 | 126, n)
    else:
        header = struct.pack("!BBQ", b0, 0x80 | 127, n)
    body = bytes(c ^ mask[i & 3] for i, c in enumerate(payload))
    return header + mask + body
