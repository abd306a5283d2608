"""Pins for JSON-LD + microdata extraction
(operators/structured.py)."""

from htmlparser_spark.operators.structured import (
    parse_structured,
    structured_data,
)

PAGE = """<html><head>
<script type="application/ld+json">{"@context":"https://schema.org",
 "@type":"Article","headline":"H1","author":{"@type":"Person",
 "name":"Ann"},"keywords":["k1","k2"],"wordCount":412,
 "free":true,"sub":null}</script>
<script type="application/ld+json">broken {json</script>
<script type="application/ld+json">{"@graph":[
 {"@type":"A","x":1},{"@type":["B","C"],"y":2.5}]}</script>
<script type="text/javascript">var notLd = 1;</script>
</head><body>
<div itemscope itemtype="https://schema.org/Product">
  <span itemprop="name">Widget</span>
  <meta itemprop="price" content="9.99">
  <a itemprop="url" href="/w">buy</a>
  <time itemprop="released" datetime="2023-05-05">May</time>
  <div itemprop="brand" itemscope itemtype="https://schema.org/Brand">
    <span itemprop="name">Acme</span>
  </div>
  <img itemprop="image photo" src="/i.png">
</div></body></html>"""


def rows_of(src):
    return [r for r in parse_structured(PAGE) if r[0] == src]


def test_jsonld_flattening_and_scalars():
    j = rows_of("jsonld")
    blk0 = [r for r in j if r[1] == 0]
    assert ("jsonld", 0, 0, "Article", "headline", "H1", None) in blk0
    # nested dict -> dotted path; @type/@context never emit
    assert ("jsonld", 0, 0, "Article", "author.name", "Ann",
            None) in blk0
    assert not [r for r in blk0 if r[4] in ("@type", "@context",
                                            "author.@type")]
    # scalar array multiplicity; JSON-style stringification
    assert [r[5] for r in blk0 if r[4] == "keywords"] == ["k1", "k2"]
    assert ("jsonld", 0, 0, "Article", "wordCount", "412",
            None) in blk0
    assert ("jsonld", 0, 0, "Article", "free", "true", None) in blk0
    assert ("jsonld", 0, 0, "Article", "sub", None, None) in blk0


def test_jsonld_graph_blocks_and_malformed_skip():
    j = rows_of("jsonld")
    # malformed block contributes nothing and leaves no gap:
    # the @graph block is block 1, its two items indexed 0/1
    assert ("jsonld", 1, 0, "A", "x", "1", None) in j
    assert ("jsonld", 1, 1, "B", "y", "2.5", None) in j  # first @type
    assert {r[1] for r in j} == {0, 1}


def test_microdata_value_rules_and_nesting():
    m = rows_of("microdata")
    prod = [r for r in m if r[2] == 0]
    t = "https://schema.org/Product"
    assert ("microdata", None, 0, t, "name", "Widget", None) in prod
    assert ("microdata", None, 0, t, "price", "9.99", None) in prod
    assert ("microdata", None, 0, t, "url", "/w", None) in prod
    assert ("microdata", None, 0, t, "released", "2023-05-05",
            None) in prod
    # multi-name itemprop fans out
    assert ("microdata", None, 0, t, "image", "/i.png", None) in prod
    assert ("microdata", None, 0, t, "photo", "/i.png", None) in prod
    # nested itemscope: reference row on the parent, own rows under
    # its own item_idx — and its props never leak into the parent
    assert ("microdata", None, 0, t, "brand", None, 1) in prod
    assert [r[5] for r in prod if r[4] == "name"] == ["Widget"]
    assert ("microdata", None, 1, "https://schema.org/Brand", "name",
            "Acme", None) in m


def test_plain_page_emits_nothing():
    assert parse_structured("<html><p>plain</p></html>") == []


def test_spark_surface(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, None), (3, "<p>no data</p>")],
        "doc_id long, text string")
    out = structured_data(df).collect()
    assert {r.doc_id for r in out} == {1}
    assert {r.src for r in out} == {"jsonld", "microdata"}
    ref = [r for r in out if r.prop == "brand"][0]
    assert ref.value is None and ref.ref_item == 1
