"""Flight server session middleware (reference arrow/flight/session —
cookie-based stateful server sessions with Set/Get/CloseSessionOptions
actions).

Usage on a server:

    class MyServer(FlightServerBase):
        def __init__(self):
            super().__init__(...)
            self.sessions = SessionManager()
        def do_get(self, ctx, ticket):
            sess = self.sessions.session(ctx)   # creates + sets cookie
            sess["hits"] = sess.get("hits", 0) + 1

Clients replay cookies with CookieMiddleware (reference
cookie_middleware.go).
"""
from __future__ import annotations

import threading
import uuid
from typing import Any, Dict, Optional

import grpc

COOKIE_NAME = "arrow_flight_session_id"


class Session(dict):
    """Per-client key/value state."""

    def __init__(self, session_id: str):
        super().__init__()
        self.id = session_id
        self.closed = False


class SessionManager:
    """Server-side cookie sessions (reference session/session.go
    stateful middleware)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._sessions: Dict[str, Session] = {}

    def _cookie_from(self, ctx) -> Optional[str]:
        for k, v in ctx.invocation_metadata() or ():
            if k.lower() == "cookie":
                for part in v.split(";"):
                    part = part.strip()
                    if part.startswith(COOKIE_NAME + "="):
                        return part.split("=", 1)[1]
        return None

    def session(self, ctx) -> Session:
        """Existing session from the request cookie, or a new one (and a
        Set-Cookie header on the response)."""
        sid = self._cookie_from(ctx)
        with self._lock:
            if sid and sid in self._sessions:
                return self._sessions[sid]
            sid = uuid.uuid4().hex
            sess = Session(sid)
            self._sessions[sid] = sess
        try:
            ctx.send_initial_metadata(
                (("set-cookie", f"{COOKIE_NAME}={sid}"),))
        except Exception:
            pass  # metadata already sent (second call on same stream)
        return sess

    def close(self, ctx) -> bool:
        sid = self._cookie_from(ctx)
        with self._lock:
            sess = self._sessions.pop(sid, None)
        if sess is not None:
            sess.closed = True
            return True
        return False

    def __len__(self) -> int:
        return len(self._sessions)


class CookieMiddleware(grpc.UnaryUnaryClientInterceptor,
                       grpc.UnaryStreamClientInterceptor,
                       grpc.StreamUnaryClientInterceptor,
                       grpc.StreamStreamClientInterceptor):
    """Client interceptor that remembers server cookies and replays them
    (reference arrow/flight cookie_middleware.go)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._cookies: Dict[str, str] = {}

    def _inject(self, details):
        with self._lock:
            if not self._cookies:
                return details
            cookie = "; ".join(f"{k}={v}" for k, v in self._cookies.items())
        md = list(details.metadata or [])
        md.append(("cookie", cookie))
        return details._replace(metadata=md) if hasattr(details, "_replace") \
            else _Details(details.method, details.timeout, md,
                          details.credentials)

    def _harvest(self, call):
        try:
            md = call.initial_metadata()
        except Exception:
            return
        for k, v in md or ():
            if k.lower() == "set-cookie" and "=" in v:
                name, val = v.split("=", 1)
                with self._lock:
                    self._cookies[name.strip()] = val.split(";")[0].strip()

    def intercept_unary_unary(self, cont, details, request):
        call = cont(self._inject(details), request)
        self._harvest(call)
        return call

    def intercept_unary_stream(self, cont, details, request):
        call = cont(self._inject(details), request)
        self._harvest(call)
        return call

    def intercept_stream_unary(self, cont, details, request_iterator):
        call = cont(self._inject(details), request_iterator)
        self._harvest(call)
        return call

    def intercept_stream_stream(self, cont, details, request_iterator):
        call = cont(self._inject(details), request_iterator)
        self._harvest(call)
        return call


class _Details:
    def __init__(self, method, timeout, metadata, credentials):
        self.method = method
        self.timeout = timeout
        self.metadata = metadata
        self.credentials = credentials
        self.wait_for_ready = None
        self.compression = None
