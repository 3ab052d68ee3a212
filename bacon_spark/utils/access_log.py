"""Access-log middleware: Apache/NCSA Combined Log Format request lines.

Parity for the reference's ported Paste TransLogger
(/root/reference/bacon/utils/logging_middleware.py:1-153) — generic HTTP
request logging around the cube views, one combined-format line per
response to a ``'wsgi'`` logger. Most deployments let the front web
server write this log; the middleware exists for the bare-WSGI /
behind-nothing deployments the reference supported.

Re-expressed in three layers so the FORMAT logic is framework-free:

* :func:`combined_log_line` — pure function from request facts to the
  log line; the piece the tests pin byte for byte.
* :class:`AccessLogMiddleware` — Django-style middleware (modern
  callable protocol with ``process_response``, same shape as
  observers/django_http.ErrorTo404Middleware). Duck-typed on
  ``request.META`` / ``response.status_code`` — it never imports
  Django, so it shim-tests exactly like the HTTP adapter.
* :func:`wsgi_access_log` — plain WSGI wrapper for the Flask path::

      app.wsgi_app = wsgi_access_log(app.wsgi_app)
"""

from __future__ import annotations

import logging
import time

__all__ = ["combined_log_line", "AccessLogMiddleware", "wsgi_access_log"]

#: Apache combined log format (reference logging_middleware.py:40-44)
FORMAT = (
    "%(REMOTE_ADDR)s - %(REMOTE_USER)s [%(time)s] "
    '"%(REQUEST_METHOD)s %(REQUEST_URI)s %(HTTP_VERSION)s" '
    '%(status)s %(content_len)s "%(HTTP_REFERER)s" "%(HTTP_USER_AGENT)s"'
)


def _tz_offset() -> str:
    off = (time.altzone if time.daylight else time.timezone) / 60 / 60 * -100
    return "+%0.4d" % off if off >= 0 else "%0.4d" % off


def combined_log_line(
    environ,
    method: str,
    req_uri: str,
    status: int,
    content_len,
    start: time.struct_time | None = None,
    fmt: str = FORMAT,
) -> str:
    """One combined-format line from WSGI-shaped request facts.

    *environ* is any mapping with the WSGI CGI keys (``REMOTE_ADDR``,
    ``REMOTE_USER``, ``SERVER_PROTOCOL``, ``HTTP_REFERER``,
    ``HTTP_USER_AGENT``) — a real WSGI environ or Django's
    ``request.META``. *start* is injectable for deterministic tests
    (the same injectable-clock convention as the DSL's relative dates)."""
    if start is None:
        start = time.localtime()
    d = {
        "REMOTE_ADDR": environ.get("REMOTE_ADDR") or "-",
        "REMOTE_USER": environ.get("REMOTE_USER") or "-",
        "REQUEST_METHOD": method,
        "REQUEST_URI": req_uri,
        "HTTP_VERSION": environ.get("SERVER_PROTOCOL") or "-",
        "time": time.strftime("%d/%b/%Y:%H:%M:%S ", start) + _tz_offset(),
        "status": status,
        "content_len": "-" if content_len is None else content_len,
        "HTTP_REFERER": environ.get("HTTP_REFERER", "-"),
        "HTTP_USER_AGENT": environ.get("HTTP_USER_AGENT", "-"),
    }
    return fmt % d


def _make_logger(logger, logger_name: str, setup_console_handler: bool):
    if logger is not None:
        return logger
    lg = logging.getLogger(logger_name)
    if setup_console_handler:
        console = logging.StreamHandler()
        console.setLevel(logging.DEBUG)
        console.setFormatter(logging.Formatter("%(message)s"))
        lg.addHandler(console)
        lg.propagate = False
        lg.setLevel(logging.DEBUG)
    return lg


class AccessLogMiddleware:
    """Django middleware logging each response in combined format
    (reference LoggingMiddleware, logging_middleware.py:19-127).

    Place FIRST in ``MIDDLEWARE`` so it sees the final status and length
    after every other layer. Configure via constructor kwargs (when used
    programmatically) — the settings-dict indirection of the reference is
    dropped in favor of Django 2+'s factory style::

        MIDDLEWARE = ["bacon_spark.utils.access_log.AccessLogMiddleware", ...]
    """

    def __init__(
        self,
        get_response=None,
        logger=None,
        logger_name: str = "wsgi",
        logging_level: int = logging.INFO,
        setup_console_handler: bool = True,
        fmt: str = FORMAT,
    ):
        self.get_response = get_response
        self.logger = _make_logger(logger, logger_name, setup_console_handler)
        self.logging_level = logging_level
        self.fmt = fmt

    def __call__(self, request):
        response = self.get_response(request)
        return self.process_response(request, response)

    def process_response(self, request, response):
        content_len = None
        get = getattr(response, "get", None)
        if callable(get):
            content_len = get("Content-Length", None)
        if content_len is None:
            content = getattr(response, "content", None)
            if isinstance(content, (str, bytes)):
                content_len = len(content)
        line = combined_log_line(
            request.META,
            request.method,
            request.get_full_path(),
            response.status_code,
            content_len,
            fmt=self.fmt,
        )
        self.logger.log(self.logging_level, line)
        return response


def wsgi_access_log(
    app,
    logger=None,
    logger_name: str = "wsgi",
    logging_level: int = logging.INFO,
    setup_console_handler: bool = True,
    fmt: str = FORMAT,
):
    """Wrap a WSGI callable (e.g. ``flask_app.wsgi_app``) with combined-
    format access logging — the TransLogger shape itself."""
    lg = _make_logger(logger, logger_name, setup_console_handler)

    def middleware(environ, start_response):
        req_uri = environ.get("PATH_INFO", "")
        if environ.get("QUERY_STRING"):
            req_uri += "?" + environ["QUERY_STRING"]
        state: dict = {}

        def logging_start_response(status, headers, exc_info=None):
            state["status"] = int(status.split(None, 1)[0])
            state["length"] = next(
                (v for k, v in headers if k.lower() == "content-length"), None
            )
            return start_response(status, headers, exc_info)

        result = app(environ, logging_start_response)
        lg.log(
            logging_level,
            combined_log_line(
                environ,
                environ.get("REQUEST_METHOD", "GET"),
                req_uri,
                state.get("status", 500),
                state.get("length"),
                fmt=fmt,
            ),
        )
        return result

    return middleware
