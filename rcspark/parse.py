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
    text = body.apply(lambda b: b.decode("utf-8", "replace") if b is not None else "")
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
