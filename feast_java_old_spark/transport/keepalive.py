"""Shared keep-alive HTTP POST machinery for the two stdlib clients.

One implementation of the dial / phase-split-retry / close-on-failure
discipline, used by both :class:`~feast_java_old_spark.sdk.
HttpJsonChannel` (the SDK's ManagedChannel analog — carries MUTATION
RPCs) and :class:`~feast_java_old_spark.transport.transform_service.
HttpTransformationService` (the per-executor transform stub). Having
one copy matters: the r14 review found the duplicated block had grown
an identical connection-poisoning defect in both places.

The rules, in order of importance:

1. **Never poison the shared socket.** ANY failure after the request
   is on the wire — timeout waiting for the status line, reset
   mid-body, a half-read response — closes the connection before the
   exception propagates. ``http.client`` connections are state
   machines; leaving one in ``REQ_SENT``/unread-response state makes
   every later call fail with ``ResponseNotReady``/``CannotSendRequest``
   even though the server is healthy (and the transform client is
   cached per worker process, so a poisoned socket would outlive the
   failure that caused it).
2. **Retry only what provably never ran.** Send-phase PEER-CLOSED
   errors (``ECONNRESET``/``EPIPE``/``ECONNABORTED`` — the server shut
   the idle socket before we wrote, so the request cannot have been
   parsed) and ``RemoteDisconnected`` from ``getresponse`` (no status
   line — the same keep-alive race, caught one step later) retry ONCE,
   and only on a REUSED socket; a fresh-dial failure propagates. A
   send-phase TIMEOUT is NOT retryable: a timed-out ``sendall`` does
   not prove non-delivery — the bytes may be fully buffered in the
   kernel and delivered after we give up, so a handler may still run.
   Anything after the status line means a handler ran: never re-sent
   (a blind retry could double-apply a mutation).
3. **One request at a time.** gRPC channels are thread-safe;
   ``http.client`` is not — calls serialize on a lock.
"""

from __future__ import annotations

import errno
import http.client
import threading
from typing import Optional

# Send-phase errnos that prove the PEER closed the connection before
# (or while) we wrote — the request cannot have been parsed, so a
# one-shot retry on a reused socket is mutation-safe. socket.timeout
# (TimeoutError) is deliberately NOT here: a timed-out send may have
# delivered every byte.
_PEER_CLOSED_ERRNOS = frozenset(
    {errno.ECONNRESET, errno.EPIPE, errno.ECONNABORTED}
)


def _peer_closed_on_send(exc: OSError) -> bool:
    if isinstance(exc, TimeoutError):  # socket.timeout subclasses this
        return False
    if isinstance(
        exc,
        (ConnectionResetError, BrokenPipeError, ConnectionAbortedError),
    ):
        return True
    return getattr(exc, "errno", None) in _PEER_CLOSED_ERRNOS


class KeepAliveHttpMixin:
    """Mixin: subclasses implement ``_dial() -> HTTPConnection`` and
    call :meth:`_init_keepalive` in ``__init__``; :meth:`_post` runs
    one request under the discipline above and returns the consumed
    ``(response, payload_bytes)``."""

    def _init_keepalive(self) -> None:
        # RLock: close() locks too, and _post calls close() while
        # holding the lock (poison discipline) — a plain Lock would
        # deadlock there; the RLock keeps an external close() (another
        # thread shutting the client down) from racing an in-flight
        # _post between its fresh-check and conn.request().
        self._lock = threading.RLock()
        self._conn: Optional[http.client.HTTPConnection] = None

    def _dial(self) -> http.client.HTTPConnection:
        raise NotImplementedError

    def close(self) -> None:
        with self._lock:
            if self._conn is not None:
                try:
                    self._conn.close()
                finally:
                    self._conn = None

    def _post(self, path: str, body: bytes, headers: dict):
        with self._lock:
            for attempt in (0, 1):
                fresh = self._conn is None
                if fresh:
                    self._conn = self._dial()
                try:
                    self._conn.request("POST", path, body=body, headers=headers)
                except OSError as ex:
                    self.close()
                    if attempt or fresh or not _peer_closed_on_send(ex):
                        raise
                    continue
                except BaseException:
                    # state-machine errors (CannotSendRequest, …): the
                    # connection is unusable — drop it, don't retry.
                    self.close()
                    raise
                try:
                    resp = self._conn.getresponse()
                except http.client.RemoteDisconnected:
                    self.close()
                    if attempt or fresh:
                        raise
                    continue
                except BaseException:
                    # timeout/reset waiting for the status line: the
                    # request may have been processed — no retry, and
                    # the socket is mid-response: close it.
                    self.close()
                    raise
                try:
                    payload = resp.read()
                except BaseException:
                    # half-read response would poison every later call
                    self.close()
                    raise
                break
            if (resp.getheader("Connection", "") or "").lower() == "close":
                self.close()
            return resp, payload
