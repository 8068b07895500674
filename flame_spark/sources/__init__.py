from .textdir import load_text_dir  # noqa: F401
