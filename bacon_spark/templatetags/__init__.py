"""Django template-tag registrations (``{% load bacon_tags %}`` /
``{% load bacon_nav %}``).

Add ``"bacon_spark"`` to ``INSTALLED_APPS`` and Django discovers the
modules here; they import Django only when Django itself loads them
(the package never pulls the framework in otherwise — same optional-
dependency policy as observers/django_http). All tag bodies live in
bacon_spark.observers.template_tags, framework-free and tested without
Django."""
