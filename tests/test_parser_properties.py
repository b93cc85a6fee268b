"""Property-based hardening of the two hand-written parsers.

1. CEL literal expressions: a generated literal-only CEL expression must
   translate to Spark SQL that evaluates to the SAME value a reference
   Python evaluation of CEL semantics produces (int division truncates
   toward zero, % is integer mod, || / && short-circuit booleans).
2. Fuzz: arbitrary text fed to translate() either raises
   CELTranslationError or returns a string — never any other exception.
3. Fuzz: arbitrary text fed to jsonnet evaluate() either raises
   JsonnetError or returns a JSON value — never any other exception.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cflog2otel_spark.celtrans import CELTranslationError, translate
from cflog2otel_spark.jsonnet_min import JsonnetError, evaluate

# ---------------------------------------------------------- generators ---

_INTS = st.integers(-1000, 1000)


@st.composite
def cel_int_expr(draw, depth=0):
    """(CEL source, python value) pairs for integer arithmetic."""
    if depth >= 3 or draw(st.booleans()):
        v = draw(_INTS)
        return (f"({v})" if v < 0 else str(v)), v
    op = draw(st.sampled_from(["+", "-", "*", "/", "%"]))
    ls, lv = draw(cel_int_expr(depth=depth + 1))
    rs, rv = draw(cel_int_expr(depth=depth + 1))
    if op in ("/", "%") and rv == 0:
        op = "+"
    if op == "+":
        v = lv + rv
    elif op == "-":
        v = lv - rv
    elif op == "*":
        v = lv * rv
    elif op == "/":
        # CEL integer division truncates toward zero (Go semantics)
        v = int(lv / rv)
    else:
        # CEL % is Go %: sign follows the dividend
        v = lv - rv * int(lv / rv)
    return f"({ls} {op} {rs})", v


@st.composite
def cel_bool_expr(draw, depth=0):
    if depth >= 2:
        b = draw(st.booleans())
        return ("true" if b else "false"), b
    kind = draw(st.sampled_from(["cmp", "and", "or", "not", "lit"]))
    if kind == "lit":
        b = draw(st.booleans())
        return ("true" if b else "false"), b
    if kind == "cmp":
        op = draw(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]))
        ls, lv = draw(cel_int_expr(depth=2))
        rs, rv = draw(cel_int_expr(depth=2))
        py = {"==": lv == rv, "!=": lv != rv, "<": lv < rv,
              "<=": lv <= rv, ">": lv > rv, ">=": lv >= rv}[op]
        return f"({ls} {op} {rs})", py
    if kind == "not":
        s, v = draw(cel_bool_expr(depth=depth + 1))
        return f"(!{s})", (not v)
    ls, lv = draw(cel_bool_expr(depth=depth + 1))
    rs, rv = draw(cel_bool_expr(depth=depth + 1))
    if kind == "and":
        return f"({ls} && {rs})", (lv and rv)
    return f"({ls} || {rs})", (lv or rv)


# -------------------------------------------------------------- checks ---


def test_cel_literal_arithmetic_matches_python_semantics(spark):
    @settings(max_examples=60, deadline=None)
    @given(cel_int_expr())
    def check(pair):
        src, want = pair
        sql = translate(src)
        got = spark.sql(f"SELECT {sql} AS v").first()["v"]
        assert got == want, (src, sql)

    check()


def test_cel_boolean_logic_matches_python_semantics(spark):
    @settings(max_examples=60, deadline=None)
    @given(cel_bool_expr())
    def check(pair):
        src, want = pair
        sql = translate(src)
        got = spark.sql(f"SELECT {sql} AS v").first()["v"]
        assert got == want, (src, sql)

    check()


def test_cel_ternary_and_in(spark):
    assert spark.sql(f"SELECT {translate('1 < 2 ? 10 : 20')} v").first()["v"] == 10
    assert spark.sql(f"SELECT {translate('3 in [1, 2, 3]')} v").first()["v"] is True
    assert spark.sql(f"SELECT {translate('4 in [1, 2, 3]')} v").first()["v"] is False


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_translate_never_crashes(src):
    try:
        out = translate(src)
        assert isinstance(out, str)
    except CELTranslationError:
        pass


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_jsonnet_never_crashes(src):
    try:
        evaluate(src)
    except JsonnetError:
        pass
    except RecursionError:
        pytest.fail("unbounded recursion on adversarial input")


def test_cel_string_literals_and_methods_property(spark):
    """String literals survive translation with exact escaping (quotes,
    backslashes, unicode), and contains/startsWith/endsWith match Python
    semantics."""
    printable = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=32),
        max_size=12,
    )

    def cel_quote(s: str) -> str:
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'

    @settings(max_examples=80, deadline=None)
    @given(printable, printable)
    def check(a, b):
        for method, py in (
            ("contains", lambda: b in a),
            ("startsWith", lambda: a.startswith(b)),
            ("endsWith", lambda: a.endswith(b)),
        ):
            src = f"{cel_quote(a)}.{method}({cel_quote(b)})"
            got = spark.sql(f"SELECT {translate(src)} AS v").first()["v"]
            assert got == py(), (src, a, b)
        # literal equality round-trip
        src = f"{cel_quote(a)} == {cel_quote(a)}"
        assert spark.sql(f"SELECT {translate(src)} AS v").first()["v"] is True

    check()


# ------------------------------------------------- jsonnet text blocks ---

_BLOCK_LINES = st.lists(
    st.one_of(
        st.just(""),  # blank lines pass through
        st.text(
            alphabet=st.characters(
                min_codepoint=33, max_codepoint=126
            ),
            min_size=1,
            max_size=12,
        ).map(lambda s: s.rstrip()),
    ),
    min_size=1,
    max_size=6,
).filter(lambda ls: any(l.strip() for l in ls))


@settings(max_examples=120, deadline=None)
@given(_BLOCK_LINES, st.integers(1, 6))
def test_text_block_roundtrips_content(lines, indent_n):
    """Property: any content written into a ||| block at a fixed indent
    evaluates to exactly that content with one trailing newline per line
    (go-jsonnet lexStringBlock). Lines that are pure whitespace stay
    blank; content is indent-stripped."""
    indent = " " * indent_n
    body = "".join((indent + l if l else "") + "\n" for l in lines)
    src = "|||\n" + body + "|||"
    want = "".join(l + "\n" for l in lines)
    assert evaluate(src) == want
