from .vectors import dot_expr, norm_expr, cosine_expr        # noqa: F401
from .text import tokens_col, shingles_col, normalize_text   # noqa: F401
