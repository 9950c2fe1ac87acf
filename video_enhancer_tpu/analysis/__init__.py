"""Analysis & routing: the framework's "brain"."""

from .router import DegradationRouter  # noqa: F401
