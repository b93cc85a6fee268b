"""CEL->SQL translator unit tests (no Spark needed for pure translation)."""

import pytest

from cflog2otel_spark.celtrans import CELTranslationError, translate


@pytest.mark.parametrize(
    "cel,sql",
    [
        ("log.scStatusCategory", "sc_status_category"),
        ("cloudfront.distributionId", "distribution_id"),
        ('log.scStatusCategory == "5xx"', "(sc_status_category = '5xx')"),
        (
            '!log.xHostHeader.contains("cloudfront.net")',
            "(NOT contains(x_host_header, 'cloudfront.net'))",
        ),
        (
            'log.csUriStem.startsWith("/index.html")',
            "startswith(cs_uri_stem, '/index.html')",
        ),
        ("double(log.scBytes)", "CAST(sc_bytes AS DOUBLE)"),
        (
            "log.timeTaken * 1000.0",
            "(time_taken * CAST(1000.0 AS DOUBLE))",
        ),
        ("log.scStatus >= 500 && log.scStatus < 600",
         "((sc_status >= 500L) AND (sc_status < 600L))"),
        ("log.scStatus == 200 || log.scStatus == 304",
         "((sc_status = 200L) OR (sc_status = 304L))"),
        ('log.csMethod.endsWith("T")', "endswith(cs_method, 'T')"),
        ('log.csUriStem.matches("^/api/.*")', "regexp_like(cs_uri_stem, '^/api/.*')"),
        ("size(log.csUriStem)", "length(cs_uri_stem)"),
        ("log.scBytes + log.csBytes", "(sc_bytes + cs_bytes)"),
        ("log.scBytes / 2", "(sc_bytes DIV 2L)"),  # CEL int division truncates
        ("log.timeTaken / 2.0", "(time_taken / CAST(2.0 AS DOUBLE))"),
        ("string(log.scStatus)", "CAST(sc_status AS STRING)"),
        ('log.scStatus == 200 ? "ok" : "bad"',
         "(CASE WHEN (sc_status = 200L) THEN 'ok' ELSE 'bad' END)"),
        ("-log.timeTaken", "(- time_taken)"),
        ('"pre" + log.csMethod', "concat('pre', cs_method)"),
        ("object.key", "source"),
        ("bucket.name", "bucket_name"),
    ],
)
def test_translate(cel, sql):
    assert translate(cel) == sql


@pytest.mark.parametrize(
    "bad",
    [
        "log.unknownField",
        "notavar.x",
        "log.scStatus ==",
        'log.csUriStem.explode("x")',
        "log.scStatus @ 3",
    ],
)
def test_translate_errors(bad):
    with pytest.raises(CELTranslationError):
        translate(bad)


def test_string_escaping():
    assert translate("log.csUriStem == \"it's\"") == "(cs_uri_stem = 'it\\'s')"


def test_validate_against_schema(spark):
    from cflog2otel_spark.celtrans import validate_against_schema

    types = validate_against_schema(
        spark,
        {
            "f": translate('log.scStatusCategory == "5xx"'),
            "v": translate("double(log.scBytes)"),
            "a": translate("log.xHostHeader"),
        },
    )
    assert types == {"f": "boolean", "v": "double", "a": "string"}

    with pytest.raises(CELTranslationError):
        validate_against_schema(spark, {"bad": "nonexistent_col + 1"})


@pytest.mark.parametrize(
    "cel,sql",
    [
        (
            'log.csMethod in ["GET", "HEAD"]',
            "(cs_method IN ('GET', 'HEAD'))",
        ),
        ("log.scStatus in [200, 304]", "(sc_status IN (200L, 304L))"),
        (
            '!(log.csMethod in ["POST"])',
            "(NOT (cs_method IN ('POST')))",
        ),
    ],
)
def test_in_operator(cel, sql):
    assert translate(cel) == sql


def test_in_requires_list():
    with pytest.raises(CELTranslationError, match="list literal"):
        translate("log.csMethod in log.csHost")


def test_every_reference_cel_string_translates():
    """Every cel('...') expression in the reference README and testdata
    configs must translate (the surface a real user would paste). The one
    deliberate exception is invalid_cel.jsonnet's typo'd field, which must
    raise the unknown-field error."""
    import glob
    import re

    from cflog2otel_spark.celtrans import CELTranslationError, translate

    pat = re.compile(r"cel\('([^']+)'\)")
    sources = ["/root/reference/README.md"] + sorted(
        glob.glob("/root/reference/testdata/*.jsonnet")
    )
    seen = set()
    for path in sources:
        with open(path) as fh:
            for expr in pat.findall(fh.read()):
                seen.add((path.rsplit("/", 1)[-1], expr))
    assert len({e for _, e in seen}) >= 8  # the surface is non-trivial
    for fname, expr in sorted(seen):
        if "csURIStem" in expr:  # invalid_cel.jsonnet's deliberate typo
            import pytest as _pytest

            with _pytest.raises(CELTranslationError):
                translate(expr)
            continue
        sql = translate(expr)
        assert sql and isinstance(sql, str), (fname, expr)


def test_in_empty_list_is_false():
    """CEL evaluates `x in []` to false; SQL `IN ()` is a parse error, so
    the translator emits the constant (ADVICE r2)."""
    assert translate("log.csMethod in []") == "(1 = 0)"
    assert translate("!(log.scStatus in [])") == "(NOT (1 = 0))"
