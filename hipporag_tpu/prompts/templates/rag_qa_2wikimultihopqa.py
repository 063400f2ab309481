"""Dataset alias for the shared QA template (reference keeps per-dataset copies)."""
from .rag_qa import prompt_template  # noqa: F401
