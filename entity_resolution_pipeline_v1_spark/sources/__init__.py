from . import pages, sinks, tables  # noqa: F401
