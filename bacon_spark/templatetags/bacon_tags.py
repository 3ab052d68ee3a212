"""``{% load bacon_tags %}`` — URL helpers and table/pager HTML snippets
(reference /root/reference/bacon/django/templatetags/bacon_tags.py:1-155,
re-registered over the framework-free bodies in
bacon_spark.observers.template_tags). Only imported by Django's tag
loader, so the ``django`` import is safe here."""

from django import template
from django.utils.safestring import mark_safe

from bacon_spark.observers import template_tags as _t

register = template.Library()


@register.simple_tag
def query_url(table, query):
    return _t.query_url(table, query)


@register.simple_tag
def filter_url(table, axis, value):
    return _t.filter_url(table, axis, value)


# reference keeps a 2-arg and 3-arg form; ours is uniformly 3-arg, the
# alias preserves template compatibility
register.simple_tag(_t.filter_url, name="filter_url2")


@register.simple_tag
def hide_value_url(table, value_name):
    return _t.hide_value_url(table, value_name)


@register.simple_tag
def hide_labeled_value_url(table, axis, value):
    return _t.hide_labeled_value_url(table, axis, value)


@register.simple_tag
def pivot_url(table, axis):
    return _t.pivot_url(table, axis)


@register.simple_tag
def unpivot_url(table, axis):
    return _t.unpivot_url(table, axis)


@register.simple_tag
def drop_axis_url(table, axis):
    return _t.drop_axis_url(table, axis)


@register.simple_tag
def order_url(table, value_name, lvs=()):
    return _t.order_url(table, value_name, tuple(lvs))


@register.simple_tag
def order_asc_url(table, value_name, lvs=()):
    return _t.order_asc_url(table, value_name, tuple(lvs))


@register.simple_tag
def reset_order_url(table):
    return _t.reset_order_url(table)


@register.simple_tag
def to_page_url(table, n):
    return _t.to_page_url(table, n)


@register.simple_tag
def table(table):
    return mark_safe(_t.table_html(table))


@register.simple_tag
def table_1d(table):
    return mark_safe(_t.table_1d_html(table))


@register.simple_tag
def table_pivot(table):
    return mark_safe(_t.table_pivot_html(table))


@register.simple_tag
def pager(table):
    return mark_safe(_t.pager_html(table))
