"""Django HTTP adapter: URL patterns + the QueryError→404 middleware.

Mirror of the reference's Django layer (/root/reference/bacon/django/
views.py, csv.py, json.py, excel.py and middleware.py:14-40) over the
framework-agnostic Controller (observers/controller.py) — exactly like
the Flask blueprint (controller.py make_flask_blueprint), the adapter's
only job is extracting the request params and packing the response;
every query/render decision lives in the controller.

Django is an OPTIONAL dependency (same policy as matplotlib in
observers/plot.py): nothing here imports it at module load, so the
package works without it; the factory functions import lazily and fail
with a clear ImportError only when actually used. The adapter logic is
exercised two ways (tests/test_django_http.py): against real Django via
its test client when installed, and against a minimal request/response
shim otherwise — the shim drives the SAME view callables, so the
adapter body is tested even in Django-less environments.

Usage in a Django project::

    # urls.py
    from bacon_spark.observers.django_http import make_urlpatterns
    urlpatterns = [*make_urlpatterns(controller, prefix="sales/")]

    # settings.py — LAST in MIDDLEWARE, reference middleware.py:20-22:
    # it should only intercept errors raised in the view
    MIDDLEWARE = [..., "bacon_spark.observers.django_http.ErrorTo404Middleware"]
"""

from __future__ import annotations

from ..errors import BaconSparkError


class ErrorTo404Middleware:
    """Convert engine errors (BaconSparkError) raised in views into 404s —
    'either it is a bug ... or more likely the user is hacking the URL,
    so a 404 seems appropriate' (/root/reference/bacon/django/
    middleware.py:14-40). Like the reference, errors surface normally
    under settings.DEBUG so development sees the traceback. Written in
    the modern (Django 2+) callable style; also works under
    MiddlewareMixin-era stacks, which call the same two methods."""

    def __init__(self, get_response=None):
        self.get_response = get_response

    def __call__(self, request):
        return self.get_response(request)

    def process_exception(self, request, exception):
        from django.conf import settings
        from django.http import Http404

        if getattr(settings, "DEBUG", False):
            return None  # let the developer see the real error
        if isinstance(exception, BaconSparkError):
            raise Http404(str(exception))
        return None


def make_views(controller) -> dict:
    """The view callables, keyed by endpoint name — the same surface as
    the Flask blueprint (table.json/table.csv/table.xlsx/table.html/
    nav.json/rows.json). Split from ``make_urlpatterns`` so the bodies
    are testable without django.urls."""

    def _params(request) -> dict:
        return request.GET.dict()

    def table_json(request):
        from django.http import JsonResponse

        return JsonResponse(controller.render_json(_params(request)))

    def table_csv(request):
        from django.http import HttpResponse

        return HttpResponse(
            controller.render_csv(_params(request)), content_type="text/csv"
        )

    def table_xlsx(request):
        from django.http import HttpResponse

        return HttpResponse(
            controller.render_xlsx(_params(request)),
            content_type=(
                "application/vnd.openxmlformats-officedocument"
                ".spreadsheetml.sheet"
            ),
        )

    def table_html(request):
        from django.http import HttpResponse

        return HttpResponse(
            controller.render_html(_params(request)), content_type="text/html"
        )

    def nav_json(request):
        from django.http import JsonResponse

        return JsonResponse(controller.render_nav(_params(request)))

    def rows_json(request):
        from django.http import JsonResponse

        return JsonResponse(controller.render_rows_json(_params(request)))

    return {
        "table.json": table_json,
        "table.csv": table_csv,
        "table.xlsx": table_xlsx,
        "table.html": table_html,
        "nav.json": nav_json,
        "rows.json": rows_json,
    }


def make_urlpatterns(controller, prefix: str = "") -> list:
    """Django ``urlpatterns`` entries for one cube endpoint."""
    from django.urls import path

    views = make_views(controller)
    return [
        path(f"{prefix}{name}", view, name=f"bacon_{name.replace('.', '_')}")
        for name, view in views.items()
    ]
