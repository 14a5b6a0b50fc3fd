"""Page parsing — SURVEY.md A14 (spider parse callbacks → one vectorized UDF).

The reference's per-site Scrapy callbacks (XPath/CSS selectors) become ONE
Arrow-batched pandas UDF over the fetched body bytes, returning a struct of
(links array<string>, image_url string, caption string). Extraction rules
are data, not code-per-site: the fixture body format is
``<title>caption</title> <img src="..."> <a href="...">`` and the UDF's
regexes are the "selector config". On a real deployment the regexes become a
per-host selector table joined in before this UDF — the Spark plumbing is
identical.

`explode(links)` downstream is the flatMap that feeds discoveries back into
canonicalize → dedup (A2→A4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

PARSE_SCHEMA = T.StructType(
    [
        T.StructField("links", T.ArrayType(T.StringType()), False),
        T.StructField("image_url", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
    ]
)

_HREF = r'<a href="([^"]*)"'
_IMG = r'<img src="([^"]*)"'
_TITLE = r"<title>([^<]*)</title>"


@pandas_udf(PARSE_SCHEMA)
def parse_page(body: pd.Series) -> pd.DataFrame:
    """bytes → (links, image_url, caption); vectorized pandas str ops."""
    text = body.str.decode("utf-8", "replace").fillna("")
    links = text.str.findall(_HREF)
    image_url = text.str.extract(_IMG, expand=False)
    caption = text.str.extract(_TITLE, expand=False)
    caption = caption.mask(caption == "")  # empty title → NULL
    return pd.DataFrame(
        {
            "links": links,
            "image_url": image_url.where(image_url.notna(), None),
            "caption": caption.where(caption.notna(), None),
        }
    )


# -- extraction rules as DATA (SURVEY A14 mandate; VERDICT r1 next-round #6) ----
# The reference's per-site parse callbacks become rows in a per-host rule
# table: (host, link_re, image_re, caption_re). The rule table broadcast-
# joins onto the fetched pages and ONE pandas UDF applies each batch's few
# distinct patterns vectorized (group-by-pattern, str.findall per group) —
# adding a site means inserting a config row, not deploying code.
# [U parsel, scrapy/linkextractors]

RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("link_re", T.StringType(), False),
        T.StructField("image_re", T.StringType(), False),
        T.StructField("caption_re", T.StringType(), False),
    ]
)

DEFAULT_RULES = (_HREF, _IMG, _TITLE)


@pandas_udf(PARSE_SCHEMA)
def _parse_with_patterns(
    body: pd.Series, link_re: pd.Series, image_re: pd.Series, caption_re: pd.Series
) -> pd.DataFrame:
    """Per-row patterns, vectorized per distinct pattern (hosts ≫ patterns:
    a batch carries at most one pattern triple per host)."""
    text = body.str.decode("utf-8", "replace").fillna("")
    links = pd.Series([None] * len(text), dtype=object)
    image = pd.Series([None] * len(text), dtype=object)
    caption = pd.Series([None] * len(text), dtype=object)
    for pat in link_re.unique():
        m = (link_re == pat).to_numpy()
        links[m] = text[m].str.findall(pat)
    for pat in image_re.unique():
        m = (image_re == pat).to_numpy()
        image[m] = text[m].str.extract(pat, expand=False)
    for pat in caption_re.unique():
        m = (caption_re == pat).to_numpy()
        cap = text[m].str.extract(pat, expand=False)
        caption[m] = cap.mask(cap == "")
    return pd.DataFrame(
        {
            "links": links,
            "image_url": image.where(image.notna(), None),
            "caption": caption.where(caption.notna(), None),
        }
    )


def parse_page_with_rules(pages, rules, body_col: str = "body", host_col: str = "host"):
    """pages(..., host, body) × rules(host, *_re) → pages + `p` struct
    (links, image_url, caption), extracted under each host's own rules.

    The rule table is broadcast (config-scale: one row per configured
    host); hosts with no rule row fall back to DEFAULT_RULES via coalesce,
    so a partial config never drops pages."""
    from pyspark.sql import functions as F

    joined = pages.join(F.broadcast(rules), on=host_col, how="left")
    d_link, d_img, d_cap = DEFAULT_RULES
    return joined.withColumn(
        "p",
        _parse_with_patterns(
            F.col(body_col),
            F.coalesce(F.col("link_re"), F.lit(d_link)),
            F.coalesce(F.col("image_re"), F.lit(d_img)),
            F.coalesce(F.col("caption_re"), F.lit(d_cap)),
        ),
    ).drop("link_re", "image_re", "caption_re")
