from .termcols import (
    double_col,
    int_col,
    kw_col,
    lex,
    lex_as,
    str_col,
    term_lit,
    uri_col,
)

__all__ = [
    "term_lit",
    "uri_col",
    "str_col",
    "int_col",
    "double_col",
    "kw_col",
    "lex",
    "lex_as",
]
