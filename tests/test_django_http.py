"""Django HTTP adapter (observers/django_http): table.json/csv/xlsx/html,
nav.json, rows.json views + the QueryError→404 middleware, driven over
the demo sales cube.

Two modes: with Django installed, the real test client drives the full
stack (urlpatterns + middleware). Without it (this container), a minimal
request shim drives the SAME view callables from ``make_views`` and the
middleware's process_exception against stub django modules — so the
adapter body stays executed either way, and only the framework glue
(path(), test client) is conditionally skipped."""

import sys
import types

import pytest

from bacon_spark import CuttingBoard
from bacon_spark.errors import QueryError
from bacon_spark.observers.controller import Controller
from bacon_spark.observers.django_http import ErrorTo404Middleware, make_views
from bacon_spark.sources.sales_demo import (
    demo_cubedef,
    read_sales_csv,
    write_demo_csv,
)

HAVE_DJANGO = True
try:  # pragma: no cover - container has no django
    import django  # noqa: F401
except ImportError:
    HAVE_DJANGO = False


@pytest.fixture(scope="module")
def controller(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("djdemo") / "sales_csv")
    write_demo_csv(spark, path)
    board = CuttingBoard(demo_cubedef(), read_sales_csv(spark, path))
    return Controller(board)


@pytest.fixture()
def fake_django(monkeypatch):
    """Stub django.http / django.conf with the exact surface the adapter
    touches (JsonResponse, HttpResponse, Http404, settings.DEBUG) so the
    view bodies and middleware run for real without the framework."""
    if HAVE_DJANGO:
        yield None
        return

    class HttpResponse:
        def __init__(self, content=b"", content_type="text/html"):
            self.content = content
            self.content_type = content_type
            self.status_code = 200

    class JsonResponse(HttpResponse):
        def __init__(self, data):
            import json

            super().__init__(json.dumps(data), "application/json")
            self.data = data

    class Http404(Exception):
        pass

    http = types.ModuleType("django.http")
    http.HttpResponse = HttpResponse
    http.JsonResponse = JsonResponse
    http.Http404 = Http404
    conf = types.ModuleType("django.conf")
    conf.settings = types.SimpleNamespace(DEBUG=False)
    root = types.ModuleType("django")
    root.http = http
    root.conf = conf
    monkeypatch.setitem(sys.modules, "django", root)
    monkeypatch.setitem(sys.modules, "django.http", http)
    monkeypatch.setitem(sys.modules, "django.conf", conf)
    yield http


class _Req:
    """request.GET.dict() is the only request surface the views use."""

    def __init__(self, **params):
        self.GET = types.SimpleNamespace(dict=lambda: dict(params))


DSL = "a:state/v:units/v:amount"


def test_views_render_all_formats(controller, fake_django):
    views = make_views(controller)
    got = views["table.json"](_Req(q=DSL))
    assert got.data["rows"] and got.status_code == 200
    csv_text = views["table.csv"](_Req(q=DSL)).content
    assert "State" in csv_text.splitlines()[0]  # pretty header row
    xlsx = views["table.xlsx"](_Req(q=DSL)).content
    assert bytes(xlsx[:2]) == b"PK"  # an OOXML zip
    html = views["table.html"](_Req(q=DSL)).content
    assert "<table" in html
    nav = views["nav.json"](_Req(q=DSL))
    assert nav.data


def test_module_imports_without_django():
    # policy: optional deps never imported at module load (plot.py pattern)
    import importlib

    import bacon_spark.observers.django_http as m

    importlib.reload(m)


def test_middleware_maps_engine_error_to_404(controller, fake_django):
    mw = ErrorTo404Middleware(lambda request: "resp")
    assert mw(_Req()) == "resp"  # passthrough
    if HAVE_DJANGO:
        from django.conf import settings
        from django.http import Http404

        if not settings.configured:
            settings.configure(DEBUG=False)
    else:
        Http404 = fake_django.Http404
    with pytest.raises(Http404):
        mw.process_exception(_Req(), QueryError("unknown label: 'bogus'"))
    # non-engine errors pass through untouched
    assert mw.process_exception(_Req(), ValueError("x")) is None


def test_middleware_lets_errors_through_in_debug(controller, fake_django):
    if HAVE_DJANGO:
        pytest.skip("stub-settings variant; real-django covered above")
    sys.modules["django.conf"].settings.DEBUG = True
    try:
        mw = ErrorTo404Middleware(lambda r: r)
        assert mw.process_exception(_Req(), QueryError("boom")) is None
    finally:
        sys.modules["django.conf"].settings.DEBUG = False


def test_bad_query_raises_engine_error_for_middleware(controller, fake_django):
    views = make_views(controller)
    with pytest.raises(QueryError):
        views["table.json"](_Req(q="a:no_such_label/v:units"))


@pytest.mark.skipif(not HAVE_DJANGO, reason="django not installed")
def test_full_stack_with_real_django(controller):  # pragma: no cover
    """End-to-end through Django's test client: urlpatterns + middleware."""
    from django.conf import settings
    from django.test import Client

    from bacon_spark.observers.django_http import make_urlpatterns

    if not settings.configured:
        settings.configure(
            DEBUG=False,
            ALLOWED_HOSTS=["testserver"],
            ROOT_URLCONF=types.SimpleNamespace(
                urlpatterns=make_urlpatterns(controller)
            ),
            MIDDLEWARE=[
                "django.middleware.common.CommonMiddleware",
                "bacon_spark.observers.django_http.ErrorTo404Middleware",
            ],
        )
        import django

        django.setup()
    c = Client()
    assert c.get("/table.json", {"q": DSL}).status_code == 200
    assert c.get("/table.csv", {"q": DSL}).status_code == 200
    assert c.get("/table.xlsx", {"q": DSL}).status_code == 200
    assert c.get("/table.json", {"q": "a:bogus/v:units"}).status_code == 404
