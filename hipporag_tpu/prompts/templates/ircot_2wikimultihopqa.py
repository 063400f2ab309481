"""Dataset alias for the shared IRCoT template."""
from .ircot import prompt_template  # noqa: F401
