"""jsonnet config loading (reference jsonnet.go:45-233, config_test.go:11-31).

The 9 valid reference .jsonnet configs must load verbatim and equal the
hand-ported JSON; the invalid_* files must fail with the matching error
kind. Native function semantics (env/must_env/json_escape/base64_encode/
cel/switch) mirror jsonnet.go. No Spark needed anywhere here.
"""

import pytest

from cflog2otel_spark.config import Config, ConfigError
from cflog2otel_spark.jsonnet_min import JsonnetError, evaluate

from .conftest import CONFIGS, REFERENCE

VALID = [
    "backfil_config",
    "multi_metrics",
    "request_count_by_status_category",
    "request_count_for_5xx",
    "request_count_for_5xx_is_cumlative",
    "request_time_histogram",
    "request_time_histogram_custom_buckets",
    "switch_case",
    "switch_with_cel_value",
]


@pytest.mark.parametrize("name", VALID)
def test_reference_jsonnet_loads_verbatim(name):
    cfg = Config.load(f"{REFERENCE}/testdata/{name}.jsonnet")
    assert cfg == Config.load(f"{CONFIGS}/{name}.json")


def test_invalid_files_fail_like_the_reference():
    # config_test.go:11-31 — each invalid_* file fails with a distinct kind
    with pytest.raises(ConfigError, match="unknown log field"):
        Config.load(f"{REFERENCE}/testdata/invalid_cel.jsonnet")
    with pytest.raises(ConfigError, match="cannot use CEL native function"):
        Config.load(f"{REFERENCE}/testdata/invalid_not_cel_capable.jsonnet")
    with pytest.raises(ConfigError):  # syntax error (missing semicolon)
        Config.load(f"{REFERENCE}/testdata/invalid_syntax.jsonnet")
    with pytest.raises(ConfigError, match="unknown field"):
        Config.load(f"{REFERENCE}/testdata/invalid_unknown_field.jsonnet")


def test_custom_buckets_function_evaluates():
    cfg = Config.load(
        f"{REFERENCE}/testdata/request_time_histogram_custom_buckets.jsonnet"
    )
    assert cfg.metrics[0].boundaries == [0.0, 2.0, 4.0, 6.0, 8.0, 10.0]
    assert cfg.metrics[0].interval_seconds == 300.0


def test_cel_and_switch_natives():
    out = evaluate(
        """
        local cel = std.native('cel');
        local switch = std.native('switch');
        {
          a: cel('log.scStatus >= 500'),
          b: switch([
            { case: cel('true'), value: 'x' },
            { case: cel('false'), value: cel('log.csUriStem') },
            { default: cel('log.xHostHeader') },
          ]),
        }
        """
    )
    assert out["a"] == {"expr": "log.scStatus >= 500"}
    # jsonnet.go:181-238: cel-shaped value -> value_expr, default -> default_expr
    assert out["b"] == {
        "switch": [
            {"case": "true", "value": "x"},
            {"case": "false", "value_expr": "log.csUriStem"},
            {"default_expr": "log.xHostHeader"},
        ]
    }
    with pytest.raises(JsonnetError, match="multiple default"):
        evaluate(
            "local switch = std.native('switch');"
            "switch([{default: 'a'}, {default: 'b'}])"
        )
    with pytest.raises(JsonnetError, match="case must be a CEL expression"):
        evaluate(
            "local switch = std.native('switch');"
            "switch([{case: 'plain string', value: 1}])"
        )


def test_env_natives(monkeypatch):
    monkeypatch.setenv("CFLOG_TEST_VAR", "hello")
    monkeypatch.delenv("CFLOG_TEST_MISSING", raising=False)
    src = """
      local env = std.native('env');
      local must_env = std.native('must_env');
      { a: env('CFLOG_TEST_VAR', 'dflt'),
        b: env('CFLOG_TEST_MISSING', 'dflt'),
        c: must_env('CFLOG_TEST_VAR') }
    """
    assert evaluate(src) == {"a": "hello", "b": "dflt", "c": "hello"}
    with pytest.raises(JsonnetError, match="must_env: CFLOG_TEST_MISSING not set"):
        evaluate("local f = std.native('must_env'); f('CFLOG_TEST_MISSING')")


def test_encode_natives():
    src = """
      local json_escape = std.native('json_escape');
      local base64_encode = std.native('base64_encode');
      { j: json_escape('a"b'), b: base64_encode('hello') }
    """
    assert evaluate(src) == {"j": '"a\\"b"', "b": "aGVsbG8="}


def test_language_subset():
    assert evaluate("1 + 2 * 3") == 7
    assert evaluate("'a' + 1") == "a1"  # jsonnet string coercion
    assert evaluate("[1] + [2]") == [1, 2]
    assert evaluate("{a: 1} + {a: 2, b: 3}") == {"a": 2, "b": 3}
    assert evaluate("if 2 > 1 then 'y' else 'n'") == "y"
    assert evaluate("if false then 'y'") is None
    assert evaluate("local f(x) = x * x; std.map(f, std.range(0, 3))") == [0, 1, 4, 9]
    assert evaluate(
        "std.filter(function(x) x % 2 == 0, std.range(1, 6))"
    ) == [2, 4, 6]
    assert evaluate("std.join('-', ['a', 'b'])") == "a-b"
    assert evaluate("// comment\n# also\n/* block */ 42") == 42
    assert evaluate("local a = 1, b = a + 1; b") == 2
    assert evaluate("{['k' + 1]: true}") == {"k1": True}
    with pytest.raises(JsonnetError, match="unknown variable"):
        evaluate("nope")
    # import is now supported — but only with a base directory (file load)
    with pytest.raises(JsonnetError, match="base directory"):
        evaluate("import 'x.libsonnet'")
    # self is supported now — but only inside an object
    with pytest.raises(JsonnetError, match="outside an object"):
        evaluate("self.x")
    with pytest.raises(JsonnetError, match="std.thisDoesNotExist"):
        evaluate("std.thisDoesNotExist(1)")


def test_json_subset_roundtrip_property():
    """Property: any JSON value, rendered as a jsonnet source literal,
    evaluates back to itself (JSON is valid jsonnet)."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    json_scalars = st.one_of(
        st.none(), st.booleans(), st.integers(-2**31, 2**31),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=32),
            max_size=20,
        ),
    )
    json_values = st.recursive(
        json_scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=4),
            st.dictionaries(st.text(max_size=8), kids, max_size=4),
        ),
        max_leaves=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(json_values)
    def check(v):
        assert evaluate(_json.dumps(v)) == v

    check()


def test_ssm_native(monkeypatch, tmp_path):
    """ssm native (jsonnet.go:64-67 registers fujiwara/ssm-lookup): backed
    here by a local JSON store via CFLOG_SSM_JSON (no AWS in this runtime)."""
    src = "local ssm = std.native('ssm'); { ep: ssm('/cflog/endpoint') }"
    monkeypatch.delenv("CFLOG_SSM_JSON", raising=False)
    with pytest.raises(JsonnetError, match="no parameter store"):
        evaluate(src)
    monkeypatch.setenv("CFLOG_SSM_JSON", '{"/cflog/endpoint": "http://c:4318"}')
    assert evaluate(src) == {"ep": "http://c:4318"}
    with pytest.raises(JsonnetError, match="not found"):
        evaluate("local ssm = std.native('ssm'); ssm('/nope')")
    # file-backed store
    f = tmp_path / "store.json"
    f.write_text('{"/cflog/endpoint": "from-file"}')
    monkeypatch.setenv("CFLOG_SSM_JSON", str(f))
    assert evaluate(src) == {"ep": "from-file"}


def test_reference_readme_jsonnet_blocks_evaluate(monkeypatch):
    """Every ```jsonnet block in the reference README (the documented user
    surface) evaluates — config objects, bare switch fragments, and the
    ssm header example (against the local parameter store)."""
    import re

    monkeypatch.setenv("CFLOG_SSM_JSON", '{"/path/to/api-key": "k-123"}')
    src = open(f"{REFERENCE}/README.md").read()
    blocks = re.findall(r"```jsonnet\n(.*?)```", src, re.S)
    assert len(blocks) >= 7
    for i, body in enumerate(blocks):
        if not body.lstrip().startswith(("local", "{")):
            # expression fragments assume the natives are in scope
            body = (
                "local cel = std.native('cel');"
                "local switch = std.native('switch');\n" + body
            )
        v = evaluate(body)
        assert isinstance(v, (dict, list)), i
    # the ssm example produced the substituted header
    ssm_block = next(b for b in blocks if "ssm(" in b)
    out = evaluate(ssm_block)
    assert out["otel"]["headers"]["Authorization"] == "Bearer k-123"


def test_switch_case_with_extra_keys_is_cel():
    """jsonnet.go castCELExpr (jsonnet.go:235-248) accepts ANY map whose
    `expr` field is a string — extra keys are ignored, not disqualifying
    (ADVICE r2)."""
    out = evaluate(
        "local switch = std.native('switch');"
        "switch([{case: {expr: 'log.scStatus >= 500', note: 1}, value: 'err'},"
        "        {default: {expr: 'log.csHost', extra: true}}])"
    )
    assert out == {
        "switch": [
            {"case": "log.scStatus >= 500", "value": "err"},
            {"default_expr": "log.csHost"},
        ]
    }


def test_import_and_importstr(tmp_path):
    """go-jsonnet FileImporter semantics: relative to the importing file,
    fresh env (imports never see the importer's locals), per-load cache,
    cycles raise. Functions exported through locals are callable."""
    from cflog2otel_spark.jsonnet_min import (
        JsonnetError,
        evaluate,
        evaluate_file,
    )

    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "buckets.libsonnet").write_text(
        "local mk = function(n) std.map(function(i) i * 10.0, std.range(1, n));"
        "{ mk: mk, default_unit: importstr 'unit.txt' }"
    )
    (tmp_path / "sub" / "unit.txt").write_text("ms")
    (tmp_path / "main.jsonnet").write_text(
        # `hidden` proves the import evaluates in a fresh env
        "local hidden = 'should not leak';"
        "local lib = import 'sub/buckets.libsonnet';"
        "{ boundaries: lib.mk(3), unit: lib.default_unit }"
    )
    out = evaluate_file(str(tmp_path / "main.jsonnet"))
    assert out == {"boundaries": [10.0, 20.0, 30.0], "unit": "ms"}

    # fresh env: an imported file referencing the importer's local fails
    (tmp_path / "leaky.jsonnet").write_text("{ v: hidden }")
    (tmp_path / "main2.jsonnet").write_text(
        "local hidden = 1; (import 'leaky.jsonnet').v"
    )
    import pytest as _pytest

    with _pytest.raises(JsonnetError, match="hidden"):
        evaluate_file(str(tmp_path / "main2.jsonnet"))

    # cycle detection
    (tmp_path / "a.jsonnet").write_text("import 'b.jsonnet'")
    (tmp_path / "b.jsonnet").write_text("import 'a.jsonnet'")
    with _pytest.raises(JsonnetError, match="cycle"):
        evaluate_file(str(tmp_path / "a.jsonnet"))

    # string-source evaluation has no base dir -> clear error
    with _pytest.raises(JsonnetError, match="base directory"):
        evaluate("import 'x.jsonnet'")

    # missing file -> JsonnetError, not OSError
    (tmp_path / "missing.jsonnet").write_text("import 'nope.jsonnet'")
    with _pytest.raises(JsonnetError, match="nope"):
        evaluate_file(str(tmp_path / "missing.jsonnet"))


def test_import_through_config_load(tmp_path):
    """A multi-file user config (metric boundaries from a shared lib)
    loads through Config.load end-to-end."""
    from cflog2otel_spark.config import Config

    (tmp_path / "lib.libsonnet").write_text(
        "{ boundaries: [100.0, 500.0, 1000.0] }"
    )
    (tmp_path / "cfg.jsonnet").write_text("""
local lib = import 'lib.libsonnet';
local cel = std.native('cel');
{
  metrics: [{
    name: 'request_time',
    type: 'Histogram',
    value: cel('log.timeTaken * 1000.0'),
    boundaries: lib.boundaries,
  }],
}
""")
    cfg = Config.load(str(tmp_path / "cfg.jsonnet"))
    assert cfg.metrics[0].boundaries == [100.0, 500.0, 1000.0]


def test_std_strings_and_format():
    """The std string surface added for user .libsonnet files, checked
    against go-jsonnet's documented semantics (jsonnet.org/ref/stdlib)."""
    cases = {
        "std.format('%s=%d', ['a', 3.7])": "a=3",       # %d truncates
        "std.format('%05.2f', 3.14159)": "03.14",
        "std.format('%x / %o / %X', [255, 8, 255])": "ff / 10 / FF",
        "std.format('100%% of %s', 'it')": "100% of it",
        "'%s-%s' % ['a', 'b']": "a-b",                   # % op == format
        "'%d' % 42": "42",                               # scalar rhs
        "std.split('a,b,,c', ',')": ["a", "b", "", "c"],
        "std.splitLimit('a,b,c', ',', 1)": ["a", "b,c"],
        "std.strReplace('aXbXc', 'X', '-')": "a-b-c",
        "std.substr('hello', 1, 3)": "ell",
        "std.startsWith('hello', 'he')": True,
        "std.endsWith('hello', 'lo')": True,
        "std.asciiUpper('aB3')": "AB3",
        "std.asciiLower('aB3')": "ab3",
        "std.stringChars('abc')": ["a", "b", "c"],
        "std.lines(['a', 'b'])": "a\nb\n",
        "std.parseInt('-42')": -42,
        "std.parseJson('{\"a\": [1, 2]}')": {"a": [1, 2]},
    }
    for src, want in cases.items():
        assert evaluate(src) == want, src
    with pytest.raises(JsonnetError, match="not enough"):
        evaluate("std.format('%s %s', ['only'])")
    with pytest.raises(JsonnetError, match="too many"):
        evaluate("std.format('%s', ['a', 'b'])")


def test_std_arrays_objects_numbers():
    cases = {
        "std.mapWithIndex(function(i, x) i + x, [10, 20])": [10.0, 21.0],
        "std.foldl(function(a, b) a + b, [1, 2, 3], 100)": 106.0,
        "std.makeArray(3, function(i) i * 2)": [0.0, 2.0, 4.0],
        "std.member([1, 2], 2)": True,
        "std.member([1, 2], 5)": False,
        "std.count(['a', 'b', 'a'], 'a')": 2,
        "std.sort([3, 1, 2])": [1.0, 2.0, 3.0],
        "std.sort(['bb', 'a'], function(x) std.length(x))": ["a", "bb"],
        "std.uniq([1, 1, 2, 1])": [1.0, 2.0, 1.0],  # consecutive only
        "std.reverse([1, 2])": [2.0, 1.0],
        "std.flattenArrays([[1], [2, 3]])": [1.0, 2.0, 3.0],
        "std.join(', ', ['a', null, 'b'])": "a, b",  # nulls skipped
        "std.join([0], [[1], [2]])": [1.0, 0.0, 2.0],
        # objectFields is SORTED per the jsonnet spec
        "std.objectFields({b: 1, a: 2})": ["a", "b"],
        "std.objectValues({b: 1, a: 2})": [2.0, 1.0],
        "std.objectHas({a: 1}, 'a')": True,
        "std.objectHas({a: 1}, 'z')": False,
        "std.get({a: 1}, 'z', 'dflt')": "dflt",
        "std.abs(-3)": 3.0,
        "std.max(2, 5)": 5.0,
        "std.min(2, 5)": 2.0,
        "std.floor(3.9)": 3.0,
        "std.ceil(3.1)": 4.0,
        "std.pow(2, 10)": 1024.0,
        "std.sqrt(16)": 4.0,
        "std.mod(7, 3)": 1.0,
        "std.isString('x')": True,
        "std.isNumber(true)": False,  # bool is NOT a number
        "std.isBoolean(false)": True,
        "std.isArray([])": True,
        "std.isObject({})": True,
        "std.isFunction(function(x) x)": True,
        "std.type(null)": "null",
        "std.type([1])": "array",
        "std.md5('abc')": "900150983cd24fb0d6963f7d28e17f72",
        "std.base64('hello')": "aGVsbG8=",
    }
    for src, want in cases.items():
        assert evaluate(src) == want, src


def test_std_inherited_field_visibility(tmp_path):
    """objectFields/objectHas over an object built through local bindings
    and import composition — the shape a user .libsonnet produces (the
    evaluator's subset has no `self`)."""
    (tmp_path / "lib.libsonnet").write_text(
        "local a = 1; { a: a, b: a + 1 }"
    )
    (tmp_path / "m.jsonnet").write_text(
        "local o = import 'lib.libsonnet';\n"
        "{ fields: std.objectFields(o), has: std.objectHas(o, 'b') }"
    )
    from cflog2otel_spark.jsonnet_min import evaluate_file

    got = evaluate_file(str(tmp_path / "m.jsonnet"))
    assert got == {"fields": ["a", "b"], "has": True}


def test_object_orientation():
    """go-jsonnet object semantics: late-bound self, super chains, hidden
    fields, +: merge, $, composition sugar — checked against the
    behavior of the real interpreter (the reference embeds go-jsonnet,
    jsonnet.go:240-247)."""
    cases = {
        # self late-binds to the COMPOSED object
        "{a: self.b, b: 1} + {b: 2}": {"a": 2.0, "b": 2.0},
        "{a: 1, b: 2} + {a: super.a + 10}": {"a": 11.0, "b": 2.0},
        # hidden (::) fields resolve but never manifest
        "{f:: 5, g: self.f + 1}": {"g": 6.0},
        "{f:: 1} + {f::: 2}": {"f": 2.0},   # ::: forces visible
        "{f:: 1} + {f: 2}": {},             # ':' keeps inherited hiddenness
        # +: merges with the super value
        "{a: [1], o: {x: 1}} + {a+: [2], o+: {y: 2}}": {
            "a": [1.0, 2.0], "o": {"x": 1.0, "y": 2.0}},
        # $ is the outermost object's (late-bound) self
        "{a: 1, b: {c: $.a}}": {"a": 1.0, "b": {"c": 1.0}},
        "local x = {a: $.b, b: 1}; x + {b: 7}": {"a": 7.0, "b": 7.0},
        # composition sugar  base { ... }  ==  base + { ... }
        "local base = {a: 1}; base {b: 2}": {"a": 1.0, "b": 2.0},
        # field functions (methods), named args, parameter defaults
        "{f(x, y=10):: x + y, g: self.f(1), h: self.f(1, y=2)}": {
            "g": 11.0, "h": 3.0},
        "{local n = 3, a: n * 2}": {"a": 6.0},  # object-level locals
        "{n: 2, double():: self.n * 2, v: self.double()}": {
            "n": 2.0, "v": 4.0},
        # super walks the whole layer stack
        "{a: 1} + {a: super.a + 1} + {a: super.a + 1}": {"a": 3.0},
        "local o = {x: 1} + {y: 2}; std.objectFields(o)": ["x", "y"],
        "{[if false then 'k']: 1, a: 2}": {"a": 2.0},  # [null] elided
    }
    for src, want in cases.items():
        assert evaluate(src) == want, src


def test_comprehensions_slices_in_assert_error():
    cases = {
        "[x * x for x in std.range(1, 4) if x != 2]": [1.0, 9.0, 16.0],
        "{[k]: std.length(k) for k in ['a', 'bb']}": {"a": 1, "bb": 2},
        "local o = {a:: 1}; ['a' in o, 'b' in o]": [True, False],
        "local a = [0, 1, 2, 3, 4]; [a[1:3], a[::2], 'hello'[1:4]]": [
            [0.0, 1.0, 2.0, 3.0, 4.0][1:3], [0.0, 2.0, 4.0], "ell"],
        "assert 1 < 2 : 'bad'; 42": 42,
        # nested comprehension clauses
        "[[x, y] for x in [1, 2] for y in [10] if x > 1]": [[2.0, 10.0]],
    }
    for src, want in cases.items():
        assert evaluate(src) == want, src
    with pytest.raises(JsonnetError, match="error: boom"):
        evaluate("error 'boom'")
    with pytest.raises(JsonnetError, match="nope"):
        evaluate("assert false : 'nope'; 1")
    with pytest.raises(JsonnetError, match="neg"):
        evaluate("{assert self.a > 0 : 'neg', a: -1}")
    with pytest.raises(JsonnetError, match="duplicate"):
        evaluate("{a: 1, a: 2}")
    with pytest.raises(JsonnetError, match="no super object"):
        evaluate("{a: super.a}")


def test_oo_through_config_load(tmp_path):
    """A user config written the way go-jsonnet users actually write them:
    a base .libsonnet with hidden helper methods, overridden via
    composition sugar."""
    from cflog2otel_spark.config import Config

    (tmp_path / "base.libsonnet").write_text("""
{
  bucket(lo, n):: [lo * std.pow(2, i) for i in std.range(0, n - 1)],
  name: 'request_time',
  type: 'Histogram',
  boundaries: self.bucket(100, 3),
}
""")
    (tmp_path / "cfg.jsonnet").write_text("""
local base = import 'base.libsonnet';
local cel = std.native('cel');
{
  metrics: [base {
    value: cel('log.timeTaken * 1000.0'),
    boundaries: super.boundaries + [1000],
  }],
}
""")
    cfg = Config.load(str(tmp_path / "cfg.jsonnet"))
    assert cfg.metrics[0].boundaries == [100.0, 200.0, 400.0, 1000.0]
    assert cfg.metrics[0].name == "request_time"


def test_text_blocks():
    """||| text blocks, go-jsonnet lexer.go lexStringBlock semantics:
    the first non-blank line fixes the indent that is stripped from every
    content line, blank lines pass through, a less-indented ||| closes
    the block, and |||- chomps the single trailing newline."""
    out = evaluate(
        "{\n"
        "  a: |||\n"
        "    foo\n"
        "    bar\n"
        "  |||,\n"
        "  b: |||-\n"
        "    chomped\n"
        "  |||,\n"
        "  c: |||\n"
        "      deeper\n"
        "       nested\n"
        "      back\n"
        "  |||,\n"
        "}\n"
    )
    assert out == {
        "a": "foo\nbar\n",
        "b": "chomped",
        "c": "deeper\n nested\nback\n",
    }

    # blank interior lines survive; the result is a normal string value
    out = evaluate(
        "local t = |||\n  line1\n\n  line3\n|||;\n"
        "{ n: std.length(t), t: t }"
    )
    assert out == {"n": 13, "t": "line1\n\nline3\n"}

    # a ||| AT the content indent is literal text, not a terminator
    out = evaluate("{ t: |||\n   a\n   |||\n   b\n  ||| }")
    assert out == {"t": "a\n|||\nb\n"}


def test_text_block_errors():
    with pytest.raises(JsonnetError, match="start with whitespace"):
        evaluate("{ x: |||\nnope\n||| }")
    with pytest.raises(JsonnetError, match="match the block's indentation"):
        evaluate("{ x: |||\n   a\n  b\n  ||| }")
    with pytest.raises(JsonnetError, match="must end its line"):
        evaluate("{ x: ||| inline ||| }")
    with pytest.raises(JsonnetError, match="unterminated"):
        evaluate("{ x: |||\n  a\n")


def test_std_library_extensions():
    """The std functions multi-file/user configs commonly reach for:
    manifestation, sets, pruning, flatMap/sum/avg/all/any, char/codepoint,
    strip*, parseHex/Octal, mapWithKey, objectKeysValues, base64 decode."""
    cases = [
        ("std.manifestJsonMinified({b: 2, a: [1]})", '{"a":[1],"b":2}'),
        ("std.manifestJsonEx({a: 1}, '  ')", '{\n  "a": 1\n}'),
        (
            "std.prune({a: null, b: [], c: {d: null}, e: 1, f: [null, 2]})",
            {"e": 1, "f": [2]},
        ),
        ("std.flatMap(function(x) [x, x], [1, 2])", [1, 1, 2, 2]),
        ("std.sum([1, 2, 3.5])", 6.5),
        ("std.avg([1, 2, 3])", 2.0),
        ("std.all([true, true]) && !std.any([false])", True),
        ("std.repeat('ab', 3)", "ababab"),
        ("std.find(2, [1, 2, 3, 2])", [1, 3]),
        ("std.findSubstr('aa', 'aaaa')", [0, 1, 2]),
        ("std.set([3, 1, 3, 2])", [1, 2, 3]),
        ("std.setUnion([1, 2], [2, 3])", [1, 2, 3]),
        ("std.setInter([1, 2], [2, 3])", [2]),
        ("std.setDiff([1, 2], [2, 3])", [1]),
        ("std.setMember(2, [1, 2])", True),
        ("std.char(65)", "A"),
        ("std.codepoint('A')", 65),
        ("std.stripChars(' xy ', ' ')", "xy"),
        ("std.parseHex('ff')", 255),
        ("std.parseOctal('755')", 493),
        ("std.mapWithKey(function(k, v) v + 1, {a: 1, b: 2})",
         {"a": 2, "b": 3}),
        ("std.objectKeysValues({b: 2, a: 1})",
         [{"key": "a", "value": 1}, {"key": "b", "value": 2}]),
        ("std.escapeStringJson('a\"b')", '"a\\"b"'),
        ("std.base64Decode(std.base64('hi'))", "hi"),
        ("std.base64DecodeBytes(std.base64('hi'))", [104, 105]),
        ("std.trace('msg', 42)", 42),
    ]
    for src, want in cases:
        assert evaluate(src) == want, src
    # std.manifestJson uses go-jsonnet's 4-space indent and sorted keys
    assert evaluate("std.manifestJson({b: 2, a: [1]})") == (
        '{\n    "a": [\n        1\n    ],\n    "b": 2\n}'
    )
    with pytest.raises(JsonnetError, match="array of booleans"):
        evaluate("std.all([1])")


def test_std_numeric_extensions():
    cases = [
        ("std.clamp(5, 1, 3)", 3),
        ("std.clamp(-5, 1, 3)", 1),
        ("std.sign(-2.5)", -1),
        ("std.round(2.5)", 3.0),
        ("std.round(-2.5)", -2.0),  # go-jsonnet rounds via floor(x + 0.5)
        ("std.exp(0)", 1.0),
        ("std.log(1)", 0.0),
        ("std.isInteger(3.0) && std.isInteger(3)", True),
        ("std.isDecimal(3.5)", True),
        ("std.isEven(4) && std.isOdd(3)", True),
        ("std.foldr(function(x, acc) [x] + acc, [1, 2, 3], [])", [1, 2, 3]),
        ("std.foldr(function(x, acc) acc + std.toString(x), [1, 2], 's')",
         "s21"),
    ]
    for src, want in cases:
        assert evaluate(src) == want, src


def test_reference_production_example_loads(monkeypatch):
    """The reference's shipped Lambda example
    (lambda/mackerel/cflog2otel.jsonnet) — the one config real users
    deploy — loads end-to-end: ssm native resolves the API-key header,
    all three metric kinds and the CEL resource attribute bind."""
    monkeypatch.setenv(
        "CFLOG_SSM_JSON", '{"/cflog2otel/MACKEREL_APIKEY": "test-key"}'
    )
    cfg = Config.load(f"{REFERENCE}/lambda/mackerel/cflog2otel.jsonnet")
    assert cfg.otel["headers"] == {"Mackerel-Api-Key": "test-key"}
    assert cfg.otel["gzip"] is True
    assert [(m.name, m.type) for m in cfg.metrics] == [
        ("http.server.requests", "Count"),
        ("http.server.total_bytes", "Sum"),
        ("http.server.request_time", "Histogram"),
    ]
    assert cfg.metrics[1].unit == "Byte" and cfg.metrics[1].is_monotonic
    keys = [a.key for a in cfg.resource_attributes]
    assert keys == ["service.name", "aws.cloudfront.distribution_id"]
    assert cfg.resource_attributes[1].value.sql == "distribution_id"


def test_set_ops_thread_keyF(monkeypatch):
    """ADVICE r6: keyF was accepted but silently ignored by the set-family
    dedup/membership — go-jsonnet compares the PROJECTED keys."""
    cases = [
        ("std.set([{k: 1, v: 'a'}, {k: 1, v: 'b'}], function(x) x.k)",
         [{"k": 1, "v": "a"}]),
        ("std.setMember({k: 1, v: 'zzz'}, [{k: 1, v: 'a'}], function(x) x.k)",
         True),
        ("std.setMember({k: 9, v: 'a'}, [{k: 1, v: 'a'}], function(x) x.k)",
         False),
        ("std.setInter([{k: 1, v: 'a'}, {k: 2, v: 'b'}], [{k: 2, v: 'x'}], "
         "function(x) x.k)", [{"k": 2, "v": "b"}]),
        ("std.setDiff([{k: 1, v: 'a'}, {k: 2, v: 'b'}], [{k: 2, v: 'x'}], "
         "function(x) x.k)", [{"k": 1, "v": "a"}]),
        # setUnion keeps the FIRST argument's element on key ties
        ("std.setUnion([{k: 1, v: 'a'}], [{k: 1, v: 'B'}, {k: 3, v: 'c'}], "
         "function(x) x.k)", [{"k": 1, "v": "a"}, {"k": 3, "v": "c"}]),
        ("std.uniq([{k: 1, v: 'a'}, {k: 1, v: 'b'}, {k: 2, v: 'c'}], "
         "function(x) x.k)", [{"k": 1, "v": "a"}, {"k": 2, "v": "c"}]),
        # no keyF: raw-equality behavior unchanged
        ("std.set([3, 1, 3, 2])", [1, 2, 3]),
        ("std.setMember(2, [1, 2, 3])", True),
    ]
    for src, want in cases:
        assert evaluate(src) == want, src


def test_avg_empty_array_is_jsonnet_error():
    """ADVICE r6: std.avg([]) surfaced a raw ZeroDivisionError instead of
    the evaluator's error contract (go-jsonnet raises a runtime error)."""
    import pytest

    with pytest.raises(JsonnetError, match="empty array"):
        evaluate("std.avg([])")
    assert evaluate("std.avg([1, 2, 3])") == 2
