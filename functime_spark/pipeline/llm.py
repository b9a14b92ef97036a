"""LLM panel analysis — driver-side prompt assembly over a pivoted
panel sample.

Port of the reference's `df.llm.analyze` / `df.llm.compare` namespace
(llm/api.py:12-115, llm/common.py:56-85, llm/formatting.py:11-35):
filter a basket of entities, pivot long->wide, markdown-format, build
the instruction prompt, call a chat-completion client with token
budgeting. The Spark differences: the pivot/sample runs distributed
and only the (timestamps x basket) slice is collected; the client is
pluggable (callable str -> str) so the transport can be any provider
or an offline stub — this container has no network, so the default
client raises with the fully-built prompt available for inspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.panel import panel_cols

_ANALYZE_TASK = (
    "Analyze the following time-series forecasts as a markdown bullet list."
)
_COMPARE_TASK = (
    "Compare and contrast the following two baskets of time-series "
    "forecasts as a markdown bullet list."
)
_CONSTRAINTS = (
    " Be specific and respond with non-obvious statistical analyses."
    " Describe trend, seasonality, and anomalies. Do not provide"
    " recommendations. Do not describe the table."
)

#: rough 4-chars-per-token heuristic budget (ref common.py token cap)
_MAX_PROMPT_CHARS = 48_000


def _pivot_basket(df: DataFrame, basket: list, max_rows: int = 512) -> str:
    """(entity,time,y) -> wide markdown table for the basket entities.

    Distributed pivot + bounded collect: only `max_rows` timestamps x
    len(basket) columns ever reach the driver.
    """
    p = panel_cols(df)
    sliced = df.filter(F.col(p.entity).isin(list(basket)))
    if sliced.isEmpty():
        raise ValueError(f"No matching entities found for basket: {basket}")
    wide = (
        sliced.groupBy(p.time)
        .pivot(p.entity, list(basket))
        .agg(F.first(p.target))
        .orderBy(p.time)
        .limit(max_rows)
    )
    pdf = wide.toPandas()
    # manual markdown table (pandas.to_markdown needs tabulate, which
    # this container doesn't ship)
    cols = [str(c) for c in pdf.columns]
    lines = ["| " + " | ".join(cols) + " |",
             "| " + " | ".join("---" for _ in cols) + " |"]
    for row in pdf.itertuples(index=False):
        lines.append("| " + " | ".join(str(v) for v in row) + " |")
    return "\n".join(lines)


class _NoClient:
    def __call__(self, prompt: str) -> str:  # pragma: no cover
        raise RuntimeError(
            "no LLM client configured: pass client=<callable str -> str> "
            "(offline container — prompt was assembled successfully; "
            f"length {len(prompt)} chars)"
        )


def analyze(
    df: DataFrame,
    basket: list,
    context: str | None = None,
    client=None,
    _return_prompt: bool = False,
):
    """Ref llm/api.py:36-75. Returns the model's analysis string."""
    table = _pivot_basket(df, basket)
    prompt = _ANALYZE_TASK + (
        f" The context is: {context}." if context else ""
    ) + _CONSTRAINTS + "\n\n" + table
    prompt = prompt[:_MAX_PROMPT_CHARS]
    if _return_prompt:
        return prompt
    return (client or _NoClient())(prompt)


def compare(
    df: DataFrame,
    basket: list,
    other_basket: list,
    client=None,
    _return_prompt: bool = False,
):
    """Ref llm/api.py:77-115."""
    t1 = _pivot_basket(df, basket)
    t2 = _pivot_basket(df, other_basket)
    prompt = (
        _COMPARE_TASK
        + _CONSTRAINTS
        + "\n\nBasket A:\n\n"
        + t1
        + "\n\nBasket B:\n\n"
        + t2
    )
    prompt = prompt[:_MAX_PROMPT_CHARS]
    if _return_prompt:
        return prompt
    return (client or _NoClient())(prompt)
