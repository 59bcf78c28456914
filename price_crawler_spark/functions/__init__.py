from . import names, prices, text, urls  # noqa: F401
