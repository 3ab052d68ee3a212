"""``{% load bacon_nav %}`` — nav-widget rendering tags (reference
/root/reference/bacon/django/templatetags/bacon_nav.py:1-62), thin
Django wrappers over bacon_spark.observers.template_tags."""

from django import template
from django.utils.safestring import mark_safe

from bacon_spark.observers import template_tags as _t

register = template.Library()


@register.simple_tag
def widget(cubedef, query, widget):
    return mark_safe(_t.widget_html(cubedef, query, widget))


@register.simple_tag
def nav_panels(cubedef, query, widgets):
    return mark_safe(_t.nav_panel_html(cubedef, query, widgets))
