from .dates import from_julian, to_julian, julian_shift  # noqa: F401
