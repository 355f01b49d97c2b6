"""Source readers (SURVEY.md §2.1 S1-S10)."""

from .files import read_file, validate_source  # noqa: F401
from .registry import ExtractorRegistry  # noqa: F401
