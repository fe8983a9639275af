"""functions.html — rule-based HTML text extraction. Hand-computed
contracts; cross-engine rule equivalence is pinned by the html_extract
oracle twin."""

from pyspark.sql import functions as F

from casf_spark.functions.html import (decode_entities, extract_text,
                                       extract_title)


def _one(spark, expr_fn, s):
    df = spark.createDataFrame([(s,)], "h string")
    return df.select(expr_fn(F.col("h")).alias("o")).collect()[0].o


def test_extract_text_hand_cases(spark):
    cases = {
        # script/style content REMOVED, not just the tags
        "<p>keep</p><script>var x = 'drop';</script><p>this</p>":
            "keep this",
        "<style>p {color:red}</style><b>bold</b> text": "bold text",
        # non-greedy: markup BETWEEN two script blocks survives
        "<script>a</script><p>mid</p><script>b</script>": "mid",
        # tags become spaces so words don't weld across boundaries
        "<p>one</p><p>two</p>": "one two",
        # entity decode, &amp; LAST: &amp;lt; is the literal string &lt;
        "a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp; e &amp;lt;":
            "a <b> \"c\" 'd' & e &lt;",
        # unknown entities pass through; whitespace collapses
        "x   &copy;\n\n 2024": "x &copy; 2024",
        # attributes (with > inside quotes NOT supported — documented
        # rule-based non-goal; plain attrs strip fine)
        '<a href="u" class="k">link</a>': "link",
        # MULTI-LINE block bodies are removed whole ((?s) — the norm in
        # real HTML; a non-DOTALL pattern leaks the trailing lines)
        "<p>a</p><script>var x = 1;\nif (x) { y(); }\n</script><p>b</p>":
            "a b",
        "<style>\np { color: red }\n</style><b>c</b>": "c",
        # a stray </style> INSIDE a script must not close the script
        # (per-tag passes; the old alternation pattern truncated here
        # and leaked the script tail)
        "<p>a</p><script>var s = \"</style>\"; go();</script><p>b</p>":
            "a b",
    }
    for s, want in cases.items():
        assert _one(spark, extract_text, s) == want, s


def test_extract_title(spark):
    assert _one(spark, extract_title,
                "<html><title>T &amp; U</title><body>b</body>") == "T & U"
    assert _one(spark, extract_title, "<title lang=\"en\"> pad </title>") \
        == "pad"
    assert _one(spark, extract_title, "<body>no title</body>") == ""


def test_decode_entities_order(spark):
    # double-decode guard: one decode pass only
    assert _one(spark, decode_entities, "&amp;amp;") == "&amp;"
    assert _one(spark, decode_entities, "&amp;#39;") == "&#39;"
