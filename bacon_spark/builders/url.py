"""URL query mini-DSL: parse/unparse CubeQuery <-> compact string.

Same language as the reference (/root/reference/bacon/builders/url.py):
commands separated by ``/``, tokens by ``:``, both backslash-escapable.

Grammar::

    f:LABEL:VALUE            filter, op implied eq
    f:LABEL:OP:V1[:V2...]    filter; multi-arg ops collect a frozenset
    a:LABEL                  axis
    p:LABEL                  pivoted axis (axis + pivot mark)
    v:NAME                   visible value
    hv:NAME                  hidden (computed, not shown) value
    o:[-]NAME[:PIVOTVALUE…]  order by measure, optionally within one pivot
                             column group
    l:...                    legacy pagination, accepted and ignored
                             (/root/reference/bacon/builders/url.py:129-131)

Queries are first-class reversible strings: every rendered cell embeds the
serialized query for its drill/pivot/order action, so parse(unparse(q))
must round-trip exactly.
"""

from __future__ import annotations

from ..cubedef import CubeDef
from ..cubequery import MULTI_ARG_OPS, CubeQuery
from ..errors import QueryError
from ..utils.strings import bslash_escape, bslash_split, bslash_unescape


class UrlQueryBuilder:
    """Parse and serialize the URL DSL against a CubeDef (for typed
    parse/unparse of filter and pivot values)."""

    def __init__(self, cubedef: CubeDef):
        self.cubedef = cubedef

    # --- parse -----------------------------------------------------------
    def parse(self, s: str) -> CubeQuery:
        query = CubeQuery()
        for cmd, args in self._tokenize(s):
            handler = getattr(self, f"cmd_{cmd}", None)
            if handler is None:
                raise QueryError(f"unknown command: {cmd!r}")
            query = handler(query, *args)
        return query

    def _tokenize(self, s: str):
        for chunk in bslash_split(s or "", "/"):
            if not chunk:
                continue
            tokens = bslash_split(chunk, ":")
            cmd = tokens.pop(0)
            yield cmd, [bslash_unescape(t) for t in tokens]

    def cmd_a(self, query, name):
        self.cubedef.get_label(name)
        return query.add_axis(name)

    def cmd_p(self, query, name):
        label = self.cubedef.get_label(name)
        if not label.allow_pivot:
            raise QueryError(f"label {name!r} cannot be pivoted")
        return query.add_axis(name).set_pivot(name)

    def cmd_v(self, query, name):
        return query.add_value(name)

    def cmd_hv(self, query, name):
        return query.add_value(name, visible=False)

    def cmd_f(self, query, *args):
        # f:LABEL:VALUE | f:LABEL:OP:VALUE1[:VALUE2...]
        if len(args) == 2:
            name, op, raw = args[0], "eq", args[1]
            values = None
        elif len(args) >= 3:
            name, op = args[0], args[1]
            if op in MULTI_ARG_OPS:
                values = args[2:]
                raw = None
            elif len(args) == 3:
                raw = args[2]
                values = None
            else:
                raise QueryError(
                    f"bad number of arguments for operator {op!r}: {len(args) - 2}"
                )
        else:
            raise QueryError(f"bad number of arguments for a filter: {len(args)}")

        label = self.cubedef.get_label(name)
        if values is not None:
            value = frozenset(label.parse(v) for v in values)
        else:
            value = label.parse(raw)
        return query.add_filter(name, op, value)

    def cmd_o(self, query, name, *args):
        descending = False
        if name.startswith("-"):
            descending = True
            name = name[1:]
        pivot_values = []
        if args and query.pivots:
            for raw, axis in zip(args, query.pivots):
                pivot_values.append(self.cubedef.get_label(axis).parse(raw))
        return query.set_order(name, descending=descending, pivot_values=tuple(pivot_values))

    def cmd_l(self, query, *args):
        return query  # legacy pagination command: accepted, ignored

    # --- unparse -----------------------------------------------------------
    def unparse(self, query: CubeQuery) -> str:
        return "/".join(self._unparse_iter(query))

    def _unparse_iter(self, query: CubeQuery):
        esc = self._escape
        for name, op, value in query.filters:
            label = self.cubedef.get_label(name)
            if op in MULTI_ARG_OPS:
                if value is None:
                    body = ""
                else:
                    vals = sorted(label.unparse(v) for v in value)
                    body = ":".join(esc(v) for v in vals)
                yield f"f:{name}:{op}:{body}"
            elif op == "eq":
                yield f"f:{name}:{esc(label.unparse(value))}"
            else:
                yield f"f:{name}:{op}:{esc(label.unparse(value))}"

        for name in query.axes:
            yield ("p:" if name in query.pivots else "a:") + name

        # interleave v:/hv: in values order so parse(unparse(q)) preserves
        # the display ordering of the value list
        for name in query.values:
            yield ("hv:" if name in query.hidden_values else "v:") + name

        if query.order:
            sign, name, pivot_values = query.order
            snips = ["o", ("-" if sign < 0 else "") + name]
            if pivot_values and query.pivots:
                for value, axis in zip(pivot_values, query.pivots):
                    snips.append(esc(self.cubedef.get_label(axis).unparse(value)))
            yield ":".join(snips)

    @staticmethod
    def _escape(s: str) -> str:
        return bslash_escape(s, "/:")


def parse_query(s: str, cubedef: CubeDef) -> CubeQuery:
    return UrlQueryBuilder(cubedef).parse(s)


def unparse_query(query: CubeQuery, cubedef: CubeDef) -> str:
    return UrlQueryBuilder(cubedef).unparse(query)


def get_url(
    query: CubeQuery,
    cubedef: CubeDef,
    base_url: str = ".",
    param: str = "q",
    extra_params: dict | None = None,
) -> str:
    """Full URL form: serialized query percent-encoded into a query-string
    parameter (reference get_url/encode_query,
    /root/reference/bacon/builders/url.py:14-28,152-175). ':' and '/' stay
    literal — they are the DSL's own separators and URL-safe in a query
    string."""
    from urllib.parse import quote_plus

    parts = {param: unparse_query(query, cubedef)}
    if extra_params:
        parts.update(extra_params)
    qs = "&".join(
        f"{quote_plus(k)}={quote_plus(str(v), safe=':/')}" for k, v in parts.items()
    )
    return f"{base_url}?{qs}"
