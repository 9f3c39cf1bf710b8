from . import basket  # noqa: F401
