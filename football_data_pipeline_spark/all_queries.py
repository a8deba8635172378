"""Import every operator module for its registration side effects.

``__spark_entry__`` and the tests import this single module to get the
fully-populated registry.
"""

from .operators import er_queries, etl, relational, timeseries, windows  # noqa: F401

MODULES = [er_queries, etl, relational, timeseries, windows]
