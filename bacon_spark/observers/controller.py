"""Controller: request params -> query -> table -> rendered payload.

Framework-agnostic re-expression of the reference's observer controller
(/root/reference/bacon/observers/__init__.py:36-63): lazy query parsing
from a params mapping, an app-overridable ``finish_query`` hook that forces
mandatory values/axes (demo usage:
/root/reference/bacon_demo/bacon_sales/views.py:15-19), and rendering to
JSON/CSV. Web adapters (flask/django) only extract the params dict.
"""

from __future__ import annotations

import io

from ..builders.url import UrlQueryBuilder
from ..cubequery import CubeQuery
from ..engine import CuttingBoard
from ..errors import BaconSparkError, QueryError
from .csv import render_csv
from .json import (
    render_keyset_table_json,
    render_nav_json,
    render_rows_json,
    render_table_json,
)
from .tables import Page, Table1D, TablePivot


class Controller:
    """One cube endpoint: holds the board, parses ``q`` and ``page`` params,
    applies finish_query, renders."""

    query_param = "q"
    page_param = "page"

    def __init__(self, board: CuttingBoard, widgets: list | None = None):
        self.board = board
        self.builder = UrlQueryBuilder(board.cubedef)
        self.widgets = widgets or []

    # --- hook (override per app) -----------------------------------------
    def finish_query(self, query: CubeQuery) -> CubeQuery:
        """Force mandatory values/axes; identity by default."""
        return query

    # --- request handling ---------------------------------------------------
    def parse(self, params: dict) -> CubeQuery:
        q = self.builder.parse(params.get(self.query_param, "") or "")
        return self.finish_query(q)

    def table(self, params: dict):
        query = self.parse(params)
        page = Page.parse(params.get(self.page_param))
        if query.pivots:
            return TablePivot(self.board, query, page)
        return Table1D(self.board, query, page)

    def render_json(self, params: dict) -> dict:
        # keyset mode: an `after` token (or explicit paging=keyset) pages
        # by seek predicate instead of the reference's limit:offset state —
        # the emitted `next` dict is the whole next-page request
        if "after" in params or params.get("paging") == "keyset":
            query = self.parse(params)
            return render_keyset_table_json(
                self.board,
                query,
                after=params.get("after") or None,
                limit=int(params.get("limit", 100)),
            )
        t = self.table(params)
        if isinstance(t, Table1D):
            return render_table_json(t)
        raise QueryError("JSON pivot rendering: use render_csv for pivots")

    def render_rows_json(self, params: dict) -> dict:
        """Raw-rows detail endpoint, keyset-paged: `keys` (comma-separated,
        must uniquely key rows), optional `after` token, `limit`."""
        query = self.parse(params)
        keys = [k for k in (params.get("keys") or "").split(",") if k]
        if not keys:
            raise QueryError("rows endpoint needs keys=<col>[,<col>...]")
        return render_rows_json(
            self.board,
            query,
            keys,
            after=params.get("after") or None,
            limit=int(params.get("limit", 100)),
        )

    def render_nav(self, params: dict) -> dict:
        return render_nav_json(
            self.board.cubedef, self.parse(params), widgets=self.widgets
        )

    def render_html(self, params: dict) -> str:
        from .html import render_table_html

        return render_table_html(self.table(params))

    def render_csv(self, params: dict) -> str:
        out = io.StringIO()
        render_csv(out, self.table(params))
        return out.getvalue()

    def render_xlsx(self, params: dict) -> bytes:
        """xlsx workbook bytes (reference /root/reference/bacon/django/
        excel.py:8-12 — there the Django adapter saves the workbook into
        the response; here the renderer already returns bytes)."""
        from .excel import render_excel

        return render_excel(self.table(params))


def make_flask_blueprint(controller: Controller, name: str = "bacon_spark"):
    """Flask adapter (reference /root/reference/bacon/flask/builder.py:9-20:
    the adapter's only job is extracting the request params)."""
    from flask import Blueprint, Response, jsonify, request

    bp = Blueprint(name, __name__)

    # any engine error -> 404, the reference's ErrorTo404Middleware
    # contract (/root/reference/bacon/django/middleware.py:14-40): a
    # malformed/hand-edited query URL is a client problem, not a 500
    @bp.route("/table.json")
    def table_json():
        try:
            return jsonify(controller.render_json(request.args.to_dict()))
        except BaconSparkError as e:
            return jsonify({"error": str(e)}), 404

    @bp.route("/table.csv")
    def table_csv():
        try:
            return Response(
                controller.render_csv(request.args.to_dict()), mimetype="text/csv"
            )
        except BaconSparkError as e:
            return Response(str(e), status=404)

    @bp.route("/nav.json")
    def nav_json():
        try:
            return jsonify(controller.render_nav(request.args.to_dict()))
        except BaconSparkError as e:
            return jsonify({"error": str(e)}), 404

    @bp.route("/table.html")
    def table_html():
        try:
            return Response(
                controller.render_html(request.args.to_dict()), mimetype="text/html"
            )
        except BaconSparkError as e:
            return jsonify({"error": str(e)}), 404

    @bp.route("/rows.json")
    def rows_json():
        try:
            return jsonify(controller.render_rows_json(request.args.to_dict()))
        except BaconSparkError as e:
            return jsonify({"error": str(e)}), 404

    return bp
