from .exprs import (  # noqa: F401
    bool_from_token,
    davg,
    dsum,
    null_if_sentinel,
    safe_cast,
    split_part,
)
