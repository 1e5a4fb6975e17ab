from .catalog import TABLES, load_table, register_views
from .text import corpus_lines, read_text_lines

__all__ = ["TABLES", "load_table", "register_views", "corpus_lines", "read_text_lines"]
