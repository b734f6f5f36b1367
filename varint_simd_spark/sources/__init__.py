"""Sources & sinks: synthetic web_pages generator, session factory,
encoded-table IO + checkpoint/resume manifest."""

from .session import get_spark
from .web_pages import generate_web_pages

__all__ = ["get_spark", "generate_web_pages"]
