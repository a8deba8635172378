"""Import every operator module for its registration side effects.

``__spark_entry__`` and the tests import this single module to get the
fully-populated registry.
"""

from .operators import relational, windows  # noqa: F401

MODULES = [relational, windows]
