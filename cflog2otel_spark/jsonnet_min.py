"""Minimal jsonnet evaluator for config loading.

The reference loads every config through a go-jsonnet VM with six native
functions registered (/root/reference/jsonnet.go:45-233): cel, switch,
env, must_env, json_escape, base64_encode. This module evaluates the
jsonnet subset those configs (and the README examples) exercise, entirely
in Python — no external jsonnet binding required:

  - // , # and /* */ comments
  - local bindings, including function bindings
    (`local f(a, b) = expr;`) and anonymous `function(x) expr`
  - object / array / string ('' or "") / number / true / false / null
    literals, trailing commas
  - arithmetic + - * / % with jsonnet precedence, unary ! and -,
    comparisons, == !=, && ||, if/then/else
  - string concatenation via + (either side a string, like jsonnet),
    array concatenation, shallow object merge
  - field access a.b, indexing a[i], function calls
  - std.native(name) plus the std functions the reference's configs use
    (map, range, filter, length, join, toString)
  - `import 'lib.libsonnet'` / `importstr 'file.txt'` with go-jsonnet
    FileImporter semantics: paths resolve relative to the importing
    file, files evaluate in a fresh env (only std visible) and are
    cached per load, cycles raise

Anything outside the subset raises JsonnetError with a position, which
Config.load wraps into ConfigError — the reference's invalid_syntax.jsonnet
(missing semicolon after a local bind) fails here exactly as go-jsonnet
does.

Native function semantics mirror jsonnet.go:
  env(name, default)   -> os.environ value, or `default` when empty/unset
                          (jsonnet.go:99-119 uses os.Getenv: empty == unset)
  must_env(name)       -> value, error when unset (jsonnet.go:81-97)
  json_escape(s)       -> JSON string literal of s (jsonnet.go:121-139)
  base64_encode(s)     -> std base64 (jsonnet.go:141-160)
  cel(expr)            -> {"expr": expr} (jsonnet.go:162-179)
  switch(cases)        -> {"switch": [...]} with case/value fields
                          normalized to case / value_expr / default_expr
                          strings (jsonnet.go:181-238)
"""

from __future__ import annotations

import base64
import json
import os
import re
from typing import Any


class JsonnetError(ValueError):
    pass


# ------------------------------------------------------------------ lexer --

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|\#[^\n]*|/\*.*?\*/)
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<string>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<op>\|\||&&|==|!=|<=|>=|[{}\[\]():;,.=+\-*/%<>!])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {"local", "function", "if", "then", "else", "true", "false", "null",
             "import", "importstr", "self", "super", "assert", "error", "in",
             "tailstrict"}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\", "/": "/"}


def _unquote(raw: str) -> str:
    body = raw[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            i += 1
            e = body[i]
            if e == "u":
                cp = int(body[i + 1 : i + 5], 16)
                i += 5
                # combine UTF-16 surrogate pairs (JSON escapes astral chars
                # as \uD8xx\uDCxx — two escapes, one code point)
                if 0xD800 <= cp <= 0xDBFF and body[i : i + 2] == "\\u":
                    lo = int(body[i + 2 : i + 6], 16)
                    if 0xDC00 <= lo <= 0xDFFF:
                        cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                        i += 6
                out.append(chr(cp))
                continue
            if e not in _ESCAPES:
                raise JsonnetError(f"unsupported escape \\{e}")
            out.append(_ESCAPES[e])
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize(src: str) -> list[tuple[str, str, int]]:
    toks: list[tuple[str, str, int]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            line = src.count("\n", 0, pos) + 1
            raise JsonnetError(f"line {line}: unexpected character {src[pos]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        text = m.group()
        line = src.count("\n", 0, m.start()) + 1
        if kind == "ident" and text in _KEYWORDS:
            kind = text
        toks.append((kind, text, line))
    toks.append(("eof", "", src.count("\n") + 1))
    return toks


# ----------------------------------------------------------------- parser --
# Produces a tiny AST of tuples: ('num', v) ('str', v) ('true'|'false'|'null',)
# ('ident', name) ('local', [(name, params|None, expr)], body) ('obj', fields)
# ('arr', items) ('call', fn, args) ('index', obj, key) ('field', obj, name)
# ('fn', params, body) ('if', c, t, e) ('bin', op, l, r) ('un', op, x)

_BIN_LEVELS = [
    {"||"},
    {"&&"},
    {"==", "!="},
    {"<", "<=", ">", ">="},
    {"+", "-"},
    {"*", "/", "%"},
]


class _Parser:
    def __init__(self, toks: list[tuple[str, str, int]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str, int]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str, int]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> tuple[str, str, int]:
        k, v, line = self.next()
        if k != kind or (text is not None and v != text):
            want = text or kind
            raise JsonnetError(f"line {line}: expected {want!r}, got {v!r}")
        return k, v, line

    def parse(self) -> Any:
        e = self.expr()
        k, v, line = self.peek()
        if k != "eof":
            raise JsonnetError(f"line {line}: trailing input at {v!r}")
        return e

    def expr(self) -> Any:
        k, v, line = self.peek()
        if k == "local":
            self.next()
            binds = [self._bind()]
            while self.peek()[:2] == ("op", ","):
                self.next()
                binds.append(self._bind())
            self.expect("op", ";")
            return ("local", binds, self.expr())
        if k == "if":
            self.next()
            cond = self.expr()
            self.expect("then")
            then = self.expr()
            els = ("null",)
            if self.peek()[0] == "else":
                self.next()
                els = self.expr()
            return ("if", cond, then, els)
        if k == "function":
            self.next()
            return ("fn", self._params(), self.expr())
        if k in ("self", "super", "assert", "error"):
            raise JsonnetError(f"line {line}: {k!r} is not supported")
        return self._binary(0)

    def _bind(self) -> tuple[str, list[str] | None, Any]:
        _, name, _ = self.expect("ident")
        params = None
        if self.peek()[:2] == ("op", "("):
            params = self._params()
        self.expect("op", "=")
        return (name, params, self.expr())

    def _params(self) -> list[str]:
        self.expect("op", "(")
        params: list[str] = []
        while self.peek()[:2] != ("op", ")"):
            params.append(self.expect("ident")[1])
            if self.peek()[:2] == ("op", ","):
                self.next()
        self.expect("op", ")")
        return params

    def _binary(self, level: int) -> Any:
        if level == len(_BIN_LEVELS):
            return self._unary()
        left = self._binary(level + 1)
        while True:
            k, v, _ = self.peek()
            if k == "op" and v in _BIN_LEVELS[level]:
                self.next()
                right = self._binary(level + 1)
                left = ("bin", v, left, right)
            else:
                return left

    def _unary(self) -> Any:
        k, v, _ = self.peek()
        if k == "op" and v in ("!", "-", "+"):
            self.next()
            return ("un", v, self._unary())
        return self._postfix()

    def _postfix(self) -> Any:
        e = self._primary()
        while True:
            k, v, line = self.peek()
            if (k, v) == ("op", "."):
                self.next()
                _, name, _ = self.expect("ident")
                e = ("field", e, name)
            elif (k, v) == ("op", "("):
                self.next()
                args: list[Any] = []
                while self.peek()[:2] != ("op", ")"):
                    args.append(self.expr())
                    if self.peek()[:2] == ("op", ","):
                        self.next()
                self.expect("op", ")")
                e = ("call", e, args)
            elif (k, v) == ("op", "["):
                self.next()
                idx = self.expr()
                self.expect("op", "]")
                e = ("index", e, idx)
            elif (k, v) == ("op", "{"):
                raise JsonnetError(
                    f"line {line}: object composition (expr {{...}}) is not supported"
                )
            else:
                return e

    def _primary(self) -> Any:
        k, v, line = self.next()
        if k in ("import", "importstr"):
            pk, pv, pl = self.next()
            if pk != "string":
                raise JsonnetError(
                    f"line {pl}: {k} requires a string literal path"
                )
            return (k, _unquote(pv), line)
        if k == "number":
            return ("num", float(v) if ("." in v or "e" in v or "E" in v) else int(v))
        if k == "string":
            return ("str", _unquote(v))
        if k in ("true", "false", "null"):
            return (k,)
        if k == "ident":
            return ("ident", v)
        if (k, v) == ("op", "("):
            e = self.expr()
            self.expect("op", ")")
            return e
        if (k, v) == ("op", "["):
            items: list[Any] = []
            while self.peek()[:2] != ("op", "]"):
                items.append(self.expr())
                if self.peek()[:2] == ("op", ","):
                    self.next()
            self.expect("op", "]")
            return ("arr", items)
        if (k, v) == ("op", "{"):
            fields: list[tuple[Any, Any]] = []
            while self.peek()[:2] != ("op", "}"):
                fk, fv, fline = self.next()
                if fk == "ident":
                    key: Any = ("str", fv)
                elif fk == "string":
                    key = ("str", _unquote(fv))
                elif (fk, fv) == ("op", "["):
                    key = self.expr()
                    self.expect("op", "]")
                else:
                    raise JsonnetError(f"line {fline}: bad object key {fv!r}")
                self.expect("op", ":")
                fields.append((key, self.expr()))
                if self.peek()[:2] == ("op", ","):
                    self.next()
            self.expect("op", "}")
            return ("obj", fields)
        raise JsonnetError(f"line {line}: unexpected token {v!r}")


# -------------------------------------------------------------- evaluator --


class _Fn:
    __slots__ = ("params", "body", "env", "name")

    def __init__(self, params, body, env, name="anonymous"):
        self.params, self.body, self.env, self.name = params, body, env, name


def _truthy(v: Any) -> bool:
    if not isinstance(v, bool):
        raise JsonnetError(f"condition must be boolean, got {type(v).__name__}")
    return v


def _to_str(v: Any) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if isinstance(v, (int, float)):
        return str(v)
    return json.dumps(v)


def _add(a: Any, b: Any) -> Any:
    if isinstance(a, str) or isinstance(b, str):
        return _to_str(a) + _to_str(b)
    if isinstance(a, list) and isinstance(b, list):
        return a + b
    if isinstance(a, dict) and isinstance(b, dict):
        return {**a, **b}
    return a + b


def _eval(node: Any, env: dict[str, Any]) -> Any:
    op = node[0]
    if op == "num":
        return node[1]
    if op == "str":
        return node[1]
    if op == "true":
        return True
    if op == "false":
        return False
    if op == "null":
        return None
    if op == "ident":
        name = node[1]
        scope = env
        while scope is not None:
            if name in scope:
                return scope[name]
            scope = scope.get("__parent__")
        raise JsonnetError(f"unknown variable {name!r}")
    if op in ("import", "importstr"):
        return _do_import(op, node[1], env)
    if op == "local":
        child: dict[str, Any] = {"__parent__": env}
        for name, params, expr in node[1]:
            child[name] = (
                _Fn(params, expr, child, name) if params is not None else _eval(expr, child)
            )
        return _eval(node[2], child)
    if op == "obj":
        out = {}
        for key_node, val_node in node[1]:
            key = _eval(key_node, env)
            if not isinstance(key, str):
                raise JsonnetError("object key must be a string")
            out[key] = _eval(val_node, env)
        return out
    if op == "arr":
        return [_eval(x, env) for x in node[1]]
    if op == "if":
        return _eval(node[2] if _truthy(_eval(node[1], env)) else node[3], env)
    if op == "fn":
        return _Fn(node[1], node[2], env)
    if op == "field":
        obj = _eval(node[1], env)
        if isinstance(obj, dict):
            if node[2] in obj:
                return obj[node[2]]
            if isinstance(obj, _Std):
                raise JsonnetError(f"std.{node[2]} is not supported")
        raise JsonnetError(f"field {node[2]!r} not found")
    if op == "index":
        obj = _eval(node[1], env)
        idx = _eval(node[2], env)
        if isinstance(obj, list):
            return obj[int(idx)]
        if isinstance(obj, dict):
            return obj[idx]
        raise JsonnetError(f"cannot index {type(obj).__name__}")
    if op == "call":
        fn = _eval(node[1], env)
        args = [_eval(a, env) for a in node[2]]
        return _apply(fn, args)
    if op == "un":
        v = _eval(node[2], env)
        if node[1] == "!":
            return not _truthy(v)
        if node[1] == "-":
            return -v
        return +v
    if op == "bin":
        o = node[1]
        if o == "&&":
            return _truthy(_eval(node[2], env)) and _truthy(_eval(node[3], env))
        if o == "||":
            return _truthy(_eval(node[2], env)) or _truthy(_eval(node[3], env))
        a, b = _eval(node[2], env), _eval(node[3], env)
        if o == "+":
            return _add(a, b)
        if o == "-":
            return a - b
        if o == "*":
            return a * b
        if o == "/":
            return a / b  # jsonnet division is float division
        if o == "%":
            if isinstance(a, str):
                # jsonnet's str % vals == std.format(str, vals)
                return _std_format(a, b)
            return a % b
        if o == "==":
            return a == b
        if o == "!=":
            return a != b
        if o == "<":
            return a < b
        if o == "<=":
            return a <= b
        if o == ">":
            return a > b
        if o == ">=":
            return a >= b
    raise JsonnetError(f"unsupported construct {op!r}")  # pragma: no cover


def _do_import(kind: str, rel: str, env: dict[str, Any]) -> Any:
    """`import` / `importstr` resolution (go-jsonnet FileImporter
    semantics, jsonnet.go:240-247 uses the default importer): paths
    resolve relative to the IMPORTING file's directory; each file is
    evaluated once per load (cached by absolute path, like go-jsonnet's
    import cache) in a FRESH environment — imports see only std, never
    the importer's locals; cycles are an error, not a hang. `importstr`
    yields the raw file text."""
    scope: dict[str, Any] | None = env
    ctx = None
    while scope is not None:
        if "__import__" in scope:
            ctx = scope["__import__"]
            break
        scope = scope.get("__parent__")
    if ctx is None:
        raise JsonnetError(
            f"{kind} {rel!r}: imports need a base directory — load the "
            "config from a file (evaluate_file), not a string"
        )
    path = rel if os.path.isabs(rel) else os.path.normpath(
        os.path.join(ctx["dir"], rel)
    )
    key = (kind, path)
    if key in ctx["cache"]:
        return ctx["cache"][key]
    if kind == "import" and path in ctx["stack"]:
        chain = " -> ".join([*ctx["stack"], path])
        raise JsonnetError(f"import cycle: {chain}")
    try:
        with open(path) as fh:
            text = fh.read()
    except OSError as exc:
        raise JsonnetError(f"{kind} {rel!r}: {exc}") from exc
    if kind == "importstr":
        ctx["cache"][key] = text
        return text
    root: dict[str, Any] = {
        "std": _Std(_STD),
        "__parent__": None,
        "__import__": {
            "dir": os.path.dirname(path),
            "cache": ctx["cache"],
            "stack": [*ctx["stack"], path],
        },
    }
    try:
        value = _eval(_Parser(_tokenize(text)).parse(), root)
    except JsonnetError as exc:
        raise JsonnetError(f"{path}: {exc}") from exc
    ctx["cache"][key] = value
    return value


def _apply(fn: Any, args: list[Any]) -> Any:
    if callable(fn) and not isinstance(fn, _Fn):
        return fn(*args)
    if not isinstance(fn, _Fn):
        raise JsonnetError(f"not callable: {type(fn).__name__}")
    if len(args) != len(fn.params):
        raise JsonnetError(
            f"{fn.name}: expected {len(fn.params)} argument(s), got {len(args)}"
        )
    child = {"__parent__": fn.env, **dict(zip(fn.params, args))}
    return _eval(fn.body, child)


# ------------------------------------------------------- native functions --


def _cast_cel_expr(value: Any) -> str | None:
    """jsonnet.go castCELExpr (jsonnet.go:235-248): any map whose "expr"
    field is a string — extra keys are allowed and ignored, matching the
    Go type assertion `m["expr"].(string)`."""
    if isinstance(value, dict) and isinstance(value.get("expr"), str):
        return value["expr"]
    return None


def _native_switch(cases: Any) -> dict:
    if not isinstance(cases, list):
        raise JsonnetError(f"switch: invalid arguments, expected array got {type(cases).__name__}")
    out = []
    default_count = 0
    for c in cases:
        if not isinstance(c, dict):
            raise JsonnetError("switch: invalid arguments, expected object case")
        if "case" not in c:
            if "default" not in c:
                raise JsonnetError("switch: invalid arguments, expected string case")
            default_count += 1
            de = _cast_cel_expr(c["default"])
            out.append({"default_expr": de} if de is not None else {"default": c["default"]})
            continue
        ce = _cast_cel_expr(c["case"])
        if ce is None:
            raise JsonnetError("switch: case must be a CEL expression")
        if "value" not in c:
            raise JsonnetError("switch: invalid arguments, need value")
        ve = _cast_cel_expr(c["value"])
        if ve is not None:
            out.append({"case": ce, "value_expr": ve})
        else:
            out.append({"case": ce, "value": c["value"]})
    if default_count > 1:
        raise JsonnetError("switch: multiple default values in switch")
    return {"switch": out}


_NATIVES: dict[str, Any] = {
    "cel": lambda expr: {"expr": expr},
    "switch": _native_switch,
    "env": lambda name, default: os.environ.get(name, "") or default,
    "must_env": None,  # bound below (needs the error)
    "json_escape": lambda s: json.dumps(s),
    "base64_encode": lambda s: base64.b64encode(
        s.encode() if isinstance(s, str) else bytes(s)
    ).decode(),
}


def _must_env(name: str) -> str:
    if name not in os.environ:
        raise JsonnetError(f"must_env: {name} not set")
    return os.environ[name]


_NATIVES["must_env"] = _must_env


def _ssm(name: str) -> str:
    """SSM parameter lookup (the reference registers fujiwara/ssm-lookup's
    natives, jsonnet.go:64-67). No AWS here, so the backing store is a
    local JSON object: the CFLOG_SSM_JSON env var holds {"/param/path":
    "value", ...} (or a path to such a file). Unset store or missing
    parameter errors, like a failed AWS lookup would."""
    raw = os.environ.get("CFLOG_SSM_JSON")
    if not raw:
        raise JsonnetError(
            "ssm: no parameter store available (set CFLOG_SSM_JSON to a "
            "JSON object or file of {path: value}; AWS SSM is not reachable "
            "from this runtime)"
        )
    try:
        store = json.loads(raw)
    except ValueError:
        try:
            with open(raw) as fh:
                store = json.load(fh)
        except (OSError, ValueError) as exc:
            raise JsonnetError(f"ssm: invalid CFLOG_SSM_JSON: {exc}") from exc
    if name not in store:
        raise JsonnetError(f"ssm: parameter {name} not found")
    return store[name]


_NATIVES["ssm"] = _ssm


def _std_native(name: str) -> Any:
    if name not in _NATIVES:
        raise JsonnetError(f"native function {name!r} is not registered")
    return _NATIVES[name]


# std.format / the string % operator: the printf subset real configs use
# (go-jsonnet builtin_format). Conversions s d i f x X o e g, optional
# width/precision/zero-flag; %d on a jsonnet number (always float)
# truncates like go-jsonnet.
_FMT_RE = re.compile(r"%([#0\- +]*)(\d+)?(?:\.(\d+))?([sdifxXoeg%])")


def _std_format(fmt: str, vals: Any) -> str:
    if not isinstance(vals, list):
        vals = [vals]
    out: list[str] = []
    pos = 0
    idx = 0
    for m in _FMT_RE.finditer(fmt):
        out.append(fmt[pos:m.start()])
        pos = m.end()
        flags, width, prec, conv = m.groups()
        if conv == "%":
            out.append("%")
            continue
        if idx >= len(vals):
            raise JsonnetError(
                f"std.format: not enough values for {fmt!r}"
            )
        v = vals[idx]
        idx += 1
        spec = "%" + (flags or "") + (width or "") + (
            "." + prec if prec is not None else ""
        )
        if conv in ("d", "i", "x", "X", "o"):
            out.append((spec + ("d" if conv == "i" else conv)) % int(v))
        elif conv in ("f", "e", "g"):
            out.append((spec + conv) % float(v))
        else:
            out.append((spec + "s") % _to_str(v))
    out.append(fmt[pos:])
    if idx < len(vals):
        raise JsonnetError(f"std.format: too many values for {fmt!r}")
    return "".join(out)


def _std_join(sep: Any, arr: Any) -> Any:
    """jsonnet std.join: string separator joins strings, array separator
    joins arrays; null elements are skipped."""
    items = [x for x in arr if x is not None]
    if isinstance(sep, str):
        return sep.join(items)
    out: list = []
    for i, xs in enumerate(items):
        if i:
            out.extend(sep)
        out.extend(xs)
    return out


def _std_sort(arr: Any, keyF: Any = None) -> list:
    key = (lambda x: _apply(keyF, [x])) if keyF is not None else (lambda x: x)
    return sorted(arr, key=key)


def _std_uniq(arr: Any) -> list:
    # jsonnet uniq removes CONSECUTIVE duplicates (use after sort)
    out: list = []
    for x in arr:
        if not out or out[-1] != x:
            out.append(x)
    return out


_STD = {
    "native": _std_native,
    "map": lambda fn, arr: [_apply(fn, [x]) for x in arr],
    "mapWithIndex": lambda fn, arr: [
        _apply(fn, [i, x]) for i, x in enumerate(arr)
    ],
    "filter": lambda fn, arr: [x for x in arr if _truthy(_apply(fn, [x]))],
    "foldl": lambda fn, arr, init: __import__("functools").reduce(
        lambda acc, x: _apply(fn, [acc, x]), arr, init
    ),
    "range": lambda lo, hi: list(range(int(lo), int(hi) + 1)),
    "makeArray": lambda n, fn: [_apply(fn, [i]) for i in range(int(n))],
    "length": lambda x: len(x),
    "join": lambda sep, arr: _std_join(sep, arr),
    "toString": _to_str,
    # strings
    "split": lambda s, c: s.split(c),
    "splitLimit": lambda s, c, n: s.split(c, int(n)),
    "strReplace": lambda s, frm, to: s.replace(frm, to),
    "substr": lambda s, frm, ln: s[int(frm):int(frm) + int(ln)],
    "startsWith": lambda a, b: a.startswith(b),
    "endsWith": lambda a, b: a.endswith(b),
    "asciiUpper": lambda s: s.upper(),
    "asciiLower": lambda s: s.lower(),
    "stringChars": lambda s: list(s),
    "format": _std_format,
    "lines": lambda arr: "".join(x + "\n" for x in arr),
    "parseInt": lambda s: int(s, 10),
    "parseJson": json.loads,
    # arrays
    "member": lambda arr, x: x in arr,
    "count": lambda arr, x: list(arr).count(x),
    "sort": _std_sort,
    "uniq": _std_uniq,
    "reverse": lambda arr: list(reversed(arr)),
    "flattenArrays": lambda arrs: [x for xs in arrs for x in xs],
    # objects (objectFields is SORTED — the jsonnet spec's field order)
    "objectHas": lambda o, f: f in o and f != "__parent__",
    "objectFields": lambda o: sorted(k for k in o if k != "__parent__"),
    "objectValues": lambda o: [
        o[k] for k in sorted(o) if k != "__parent__"
    ],
    "get": lambda o, f, default=None: o.get(f, default),
    # numbers
    "abs": abs,
    "max": max,
    "min": min,
    "floor": lambda x: float(__import__("math").floor(x)),
    "ceil": lambda x: float(__import__("math").ceil(x)),
    "pow": lambda x, n: float(x) ** float(n),
    "sqrt": lambda x: float(x) ** 0.5,
    "mod": lambda a, b: a % b,
    # type predicates
    "isString": lambda x: isinstance(x, str),
    "isNumber": lambda x: isinstance(x, (int, float))
    and not isinstance(x, bool),
    "isBoolean": lambda x: isinstance(x, bool),
    "isArray": lambda x: isinstance(x, list),
    "isObject": lambda x: isinstance(x, dict),
    "isFunction": lambda x: isinstance(x, _Fn) or callable(x),
    "type": lambda x: (
        "null" if x is None else
        "boolean" if isinstance(x, bool) else
        "number" if isinstance(x, (int, float)) else
        "string" if isinstance(x, str) else
        "array" if isinstance(x, list) else
        "object" if isinstance(x, dict) else "function"
    ),
    "base64": lambda s: base64.b64encode(
        s.encode() if isinstance(s, str) else bytes(s)
    ).decode(),
    "md5": lambda s: __import__("hashlib").md5(s.encode()).hexdigest(),
}


class _Std(dict):
    def __missing__(self, key):  # pragma: no cover - defensive
        raise JsonnetError(f"std.{key} is not supported")


def evaluate(
    src: str, filename: str = "<jsonnet>", base_dir: str | None = None
) -> Any:
    """Evaluate a jsonnet source string to a plain JSON value. `base_dir`
    enables import/importstr resolution (set automatically by
    evaluate_file); without it imports raise."""
    try:
        ast = _Parser(_tokenize(src)).parse()
        root_env: dict[str, Any] = {"std": _Std(_STD), "__parent__": None}
        if base_dir is not None:
            root_env["__import__"] = {
                "dir": base_dir,
                "cache": {},
                "stack": [os.path.abspath(filename)],
            }
        value = _eval(ast, root_env)
    except JsonnetError as exc:
        raise JsonnetError(f"{filename}: {exc}") from exc
    except RecursionError as exc:  # pragma: no cover - defensive
        raise JsonnetError(f"{filename}: recursion limit exceeded") from exc
    return _manifest(value)


def _manifest(v: Any) -> Any:
    """Force to JSON-able (functions cannot appear in the output)."""
    if isinstance(v, _Fn) or callable(v):
        raise JsonnetError("function values cannot appear in the output")
    if isinstance(v, dict):
        return {k: _manifest(x) for k, x in v.items() if k != "__parent__"}
    if isinstance(v, list):
        return [_manifest(x) for x in v]
    return v


def evaluate_file(path: str) -> Any:
    path = os.path.abspath(path)
    with open(path) as fh:
        return evaluate(
            fh.read(), filename=path, base_dir=os.path.dirname(path)
        )
