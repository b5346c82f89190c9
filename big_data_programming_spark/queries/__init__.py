"""Named query catalog. Modules here self-register via
:func:`big_data_programming_spark.registry.register`; the list of
modules lives in ``registry._QUERY_MODULES`` so the catalog is loaded
lazily and in one place."""
