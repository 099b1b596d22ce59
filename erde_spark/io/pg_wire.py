"""Minimal PostgreSQL frontend/backend (v3) wire-protocol client.

The container ships a PostgreSQL server but neither the JDBC jar nor any
Python driver, so — in the same spirit as the stdlib GPKG/SHP/FGB/BIFF8
codecs — this implements the public protocol (documented in the
PostgreSQL manual, "Frontend/Backend Protocol") directly: startup,
trust / cleartext / MD5 / SCRAM-SHA-256 auth (RFC 5802/7677 SASL — the
server default since PostgreSQL 14), the simple query cycle, and both
COPY directions. It backs :class:`erde_spark.io.PostgresDriver`'s
fallback path and lets the Postgres round-trip be TESTED against a live
server in-container instead of remaining a code-complete-only surface.

Text-format COPY is used for data movement: COPY is the fast bulk path
on the server side, and per-partition ``copy_in`` connections give a
distributed write without any driver jar.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import socket
import struct


class PgError(RuntimeError):
    pass


class PgConnection:
    """One blocking connection speaking the simple-query protocol."""

    def __init__(self, host: str, port: int, user: str, dbname: str,
                 password: str | None = None):
        self.sock = socket.create_connection((host, int(port)), timeout=60)
        self.buf = b''
        params = f'user\0{user}\0database\0{dbname}\0\0'.encode()
        pkt = struct.pack('>ii', 8 + len(params), 196608) + params
        self.sock.sendall(pkt)
        self._auth(user, password or '')

    # -- framing ---------------------------------------------------------

    def _read(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise PgError('server closed connection')
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def _recv(self) -> tuple[bytes, bytes]:
        head = self._read(5)
        mtype = head[:1]
        ln = struct.unpack('>i', head[1:])[0]
        return mtype, self._read(ln - 4)

    def _send(self, mtype: bytes, payload: bytes = b''):
        self.sock.sendall(mtype + struct.pack('>i', len(payload) + 4)
                          + payload)

    @staticmethod
    def _error_text(payload: bytes) -> str:
        fields = {}
        for part in payload.split(b'\0'):
            if part:
                fields[chr(part[0])] = part[1:].decode('utf-8', 'replace')
        return fields.get('M', 'unknown postgres error')

    # -- startup ---------------------------------------------------------

    def _auth(self, user: str, password: str):
        scram = None
        while True:
            mtype, payload = self._recv()
            if mtype == b'R':
                code = struct.unpack('>i', payload[:4])[0]
                if code == 0:
                    continue
                if code == 3:  # cleartext
                    self._send(b'p', password.encode() + b'\0')
                elif code == 5:  # md5
                    salt = payload[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()).hexdigest()
                    outer = hashlib.md5(
                        inner.encode() + salt).hexdigest()
                    self._send(b'p', b'md5' + outer.encode() + b'\0')
                elif code == 10:  # AuthenticationSASL
                    mechs = payload[4:].split(b'\0')
                    if b'SCRAM-SHA-256' not in mechs:
                        raise PgError(f'no supported SASL mechanism in {mechs}')
                    scram = _Scram(password)
                    first = scram.client_first()
                    self._send(b'p', b'SCRAM-SHA-256\0'
                               + struct.pack('>i', len(first)) + first)
                elif code == 11:  # AuthenticationSASLContinue
                    self._send(b'p', scram.client_final(payload[4:]))
                elif code == 12:  # AuthenticationSASLFinal
                    scram.verify_server(payload[4:])
                else:
                    raise PgError(
                        f'unsupported auth method {code} (trust/cleartext/'
                        'md5/scram-sha-256; configure pg_hba accordingly)')
            elif mtype == b'E':
                raise PgError(self._error_text(payload))
            elif mtype == b'Z':
                return
            # 'S' parameter status / 'K' backend key: ignore

    # -- simple query ----------------------------------------------------

    def query(self, sql: str):
        """Run one statement; returns (columns, rows) where columns is
        [(name, type_oid)] and rows hold text cells (None for NULL)."""
        self._send(b'Q', sql.encode() + b'\0')
        cols, rows, err = [], [], None
        while True:
            mtype, payload = self._recv()
            if mtype == b'T':
                n = struct.unpack('>h', payload[:2])[0]
                p, cols = 2, []
                for _ in range(n):
                    z = payload.index(b'\0', p)
                    name = payload[p:z].decode()
                    oid = struct.unpack('>i', payload[z + 7:z + 11])[0]
                    cols.append((name, oid))
                    p = z + 19
            elif mtype == b'D':
                n = struct.unpack('>h', payload[:2])[0]
                p, row = 2, []
                for _ in range(n):
                    ln = struct.unpack('>i', payload[p:p + 4])[0]
                    p += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(payload[p:p + ln].decode())
                        p += ln
                rows.append(row)
            elif mtype == b'E':
                err = self._error_text(payload)
            elif mtype == b'Z':
                if err:
                    raise PgError(err)
                return cols, rows
            # 'C' command complete / 'N' notice / others: ignore

    # -- COPY ------------------------------------------------------------

    def copy_out(self, sql: str):
        """``COPY ... TO STDOUT`` — yields raw data chunks."""
        self._send(b'Q', sql.encode() + b'\0')
        err = None
        while True:
            mtype, payload = self._recv()
            if mtype == b'd':
                yield payload
            elif mtype == b'E':
                err = self._error_text(payload)
            elif mtype == b'Z':
                if err:
                    raise PgError(err)
                return
            # 'H' CopyOutResponse / 'c' CopyDone / 'C': ignore

    def copy_in(self, sql: str, chunks):
        """``COPY ... FROM STDIN`` — streams ``chunks`` of bytes. The
        connection is always drained to ReadyForQuery (success, server
        error, or client-side CopyFail), so it stays reusable."""
        self._send(b'Q', sql.encode() + b'\0')
        while True:
            mtype, payload = self._recv()
            if mtype == b'G':
                break
            if mtype == b'E':
                # drain to ready-for-query, then raise
                msg = self._error_text(payload)
                self._drain_to_ready()
                raise PgError(msg)
            if mtype == b'Z':
                raise PgError(
                    f'statement did not initiate COPY IN: {sql!r}')
        try:
            for chunk in chunks:
                if chunk:
                    self._send(b'd', bytes(chunk))
        except Exception:
            self._send(b'f', b'client error\0')  # CopyFail
            self._drain_to_ready()  # consume the server's E + Z
            raise
        self._send(b'c')
        err = None
        while True:
            mtype, payload = self._recv()
            if mtype == b'E':
                err = self._error_text(payload)
            elif mtype == b'Z':
                if err:
                    raise PgError(err)
                return

    def _drain_to_ready(self):
        while self._recv()[0] != b'Z':
            pass

    def close(self):
        try:
            self._send(b'X')
            self.sock.close()
        except OSError:
            pass


class _Scram:
    """Client side of SCRAM-SHA-256 (RFC 5802/7677), channel-binding
    disabled ('n,,' GS2 header — this client doesn't do TLS)."""

    def __init__(self, password: str):
        self.password = password.encode()
        self.nonce = base64.b64encode(os.urandom(18)).decode()
        self.client_first_bare = f'n=,r={self.nonce}'.encode()

    def client_first(self) -> bytes:
        return b'n,,' + self.client_first_bare

    def client_final(self, server_first: bytes) -> bytes:
        fields = dict(kv.split(b'=', 1) for kv in server_first.split(b','))
        srv_nonce = fields[b'r'].decode()
        if not srv_nonce.startswith(self.nonce):
            raise PgError('SCRAM server nonce does not extend client nonce')
        salt = base64.b64decode(fields[b's'])
        iters = int(fields[b'i'])
        salted = hashlib.pbkdf2_hmac('sha256', self.password, salt, iters)
        client_key = hmac.digest(salted, b'Client Key', 'sha256')
        stored_key = hashlib.sha256(client_key).digest()
        without_proof = f'c=biws,r={srv_nonce}'.encode()
        auth_msg = (self.client_first_bare + b',' + server_first
                    + b',' + without_proof)
        sig = hmac.digest(stored_key, auth_msg, 'sha256')
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        server_key = hmac.digest(salted, b'Server Key', 'sha256')
        self.server_sig = hmac.digest(server_key, auth_msg, 'sha256')
        return (without_proof + b',p=' + base64.b64encode(proof))

    def verify_server(self, server_final: bytes):
        fields = dict(kv.split(b'=', 1) for kv in server_final.split(b','))
        if base64.b64decode(fields[b'v']) != self.server_sig:
            raise PgError('SCRAM server signature mismatch '
                          '(server does not know the password)')


# -- COPY text-format codecs ---------------------------------------------

_ESC = {ord('\\'): '\\\\', ord('\t'): '\\t', ord('\n'): '\\n',
        ord('\r'): '\\r'}


def copy_escape(v) -> str:
    """One value -> COPY text-format cell."""
    if v is None:
        return '\\N'
    if isinstance(v, bool):
        return 't' if v else 'f'
    if isinstance(v, (bytes, bytearray)):
        return '\\\\x' + bytes(v).hex()
    return str(v).translate(_ESC)


def copy_unescape(cell: str):
    """COPY text-format cell -> str (None for ``\\N``)."""
    if cell == '\\N':
        return None
    if '\\' not in cell:
        return cell
    out, i = [], 0
    while i < len(cell):
        c = cell[i]
        if c == '\\' and i + 1 < len(cell):
            n = cell[i + 1]
            out.append({'t': '\t', 'n': '\n', 'r': '\r', '\\': '\\',
                        'b': '\b', 'f': '\f', 'v': '\v'}.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return ''.join(out)


def iter_copy_rows(chunks):
    """Raw COPY TO STDOUT chunks -> lists of unescaped cells."""
    pending = b''
    for chunk in chunks:
        pending += chunk
        while True:
            nl = pending.find(b'\n')
            if nl < 0:
                break
            line, pending = pending[:nl], pending[nl + 1:]
            yield [copy_unescape(c) for c in line.decode().split('\t')]
    if pending.strip():
        yield [copy_unescape(c) for c in pending.decode().split('\t')]
