"""R-style formula parsing for covariate specs.

The reference parses ``'y ~ x1 + x2'`` by naive string splitting
(reference utils.py:11-18 ``xform_to_strings``); ``'1'`` means
intercept-only. We keep the same surface with real validation.
"""

from __future__ import annotations

INTERCEPT = "_intercept"


class FormulaError(ValueError):
    pass


def parse_formula(xfmla: str | None) -> list[str]:
    """Parse ``'y ~ x1 + x2'`` (or ``None``) into the covariate name
    list, always led by the intercept column.

    >>> parse_formula(None)
    ['_intercept']
    >>> parse_formula('y ~ x1 + x2')
    ['_intercept', 'x1', 'x2']
    >>> parse_formula('~ 1')
    ['_intercept']
    """
    if xfmla is None:
        return [INTERCEPT]
    if "~" not in xfmla:
        raise FormulaError(f"formula must contain '~': {xfmla!r}")
    rhs = xfmla.split("~", 1)[1]
    terms = [t.strip() for t in rhs.split("+")]
    covs = [INTERCEPT]
    for term in terms:
        if term in ("", "1"):
            continue
        if not term.replace("_", "").replace(".", "").isalnum():
            raise FormulaError(f"unsupported formula term: {term!r}")
        covs.append(term)
    return covs
