"""Physical-plan inspection (SURVEY.md section 4: the optimizer work is
Catalyst's; this package is how we *verify* Catalyst did it).

``summarize(df)`` parses ``explain("formatted")`` output into a dict of the
scale-relevant facts -- join strategies chosen, filters pushed into the
parquet scan, columns actually read -- so tests can assert "this query
broadcasts the dim table and prunes to 4 columns" instead of eyeballing
plans.
"""

from .inspect import plan_text, summarize  # noqa: F401
