"""Minimal jsonnet evaluator for config loading.

The reference loads every config through a go-jsonnet VM with six native
functions registered (/root/reference/jsonnet.go:45-233): cel, switch,
env, must_env, json_escape, base64_encode. This module evaluates the
jsonnet subset those configs (and the README examples) exercise, entirely
in Python — no external jsonnet binding required:

  - // , # and /* */ comments
  - local bindings, including function bindings
    (`local f(a, b) = expr;`) and anonymous `function(x) expr`;
    parameter defaults and named call arguments
  - object / array / string ('' or "") / number / true / false / null
    literals, trailing commas
  - go-jsonnet object orientation: late-bound `self`, `super`, `$`,
    object composition `a + b` and the sugar `a { ... }`, hidden
    fields `::` (and `:::`), field merge `+:`, field functions
    (methods), object-level locals and asserts, computed field names
    with `[null]` elision
  - array and object comprehensions (`for`/`if` clauses), the `in`
    operator (sees hidden fields, like jsonnet), slices a[lo:hi:step]
  - arithmetic + - * / % with jsonnet precedence, unary ! and -,
    comparisons, == != (deep value equality), && ||, if/then/else,
    `assert cond : msg; expr`, `error expr`
  - string concatenation via + (either side a string, like jsonnet),
    string %-formatting (== std.format), array concatenation
  - field access a.b, indexing a[i], function calls
  - std.native(name) plus the std library surface real configs use
    (strings/arrays/objects/numbers/type predicates — see _STD)
  - `import 'lib.libsonnet'` / `importstr 'file.txt'` with go-jsonnet
    FileImporter semantics: paths resolve relative to the importing
    file, files evaluate in a fresh env (only std visible) and are
    cached per load, cycles raise

Top-level evaluation manifests the result exactly like go-jsonnet:
hidden fields are dropped, object asserts run, visible function values
are an error.

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
import sys
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
  | (?P<op>\|\||&&|==|!=|<=|>=|:::|::|[{}\[\]():;,.=+\-*/%<>!$])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {"local", "function", "if", "then", "else", "true", "false", "null",
             "import", "importstr", "self", "super", "assert", "error", "in",
             "for", "tailstrict"}

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


def _scan_text_block(src: str, pos: int, line: int) -> tuple[str, int]:
    """Scan a ||| text block starting just past the opening bars; returns
    (decoded string, position just past the closing |||).

    go-jsonnet semantics (lexer.go lexStringBlock): optional `-` chomps the
    final newline; the rest of the opening line must be whitespace; the
    first non-blank content line's leading whitespace fixes the indent
    every later content line must carry; blank lines stay blank; the block
    closes on a LESS-indented line holding `|||` (tokens may follow it on
    the same line, e.g. a comma)."""
    chomp = False
    if pos < len(src) and src[pos] == "-":
        chomp = True
        pos += 1
    while pos < len(src) and src[pos] in " \t\r":
        pos += 1
    if pos >= len(src) or src[pos] != "\n":
        raise JsonnetError(f"line {line}: text block ||| must end its line")
    pos += 1
    lines: list[str] = []
    indent: str | None = None
    while True:
        if pos >= len(src):
            raise JsonnetError(f"line {line}: unterminated ||| text block")
        nl = src.find("\n", pos)
        raw = src[pos:nl] if nl != -1 else src[pos:]
        nxt = (nl + 1) if nl != -1 else len(src)
        if raw.strip(" \t\r") == "":
            lines.append("")
            pos = nxt
            continue
        if indent is None:
            ws = len(raw) - len(raw.lstrip(" \t"))
            if ws == 0:
                raise JsonnetError(
                    f"line {line}: text block's first line must start "
                    "with whitespace"
                )
            indent = raw[:ws]
        if raw.startswith(indent):
            lines.append(raw[len(indent):])
            pos = nxt
            continue
        ws = len(raw) - len(raw.lstrip(" \t"))
        if raw[ws : ws + 3] == "|||":
            text = "".join(l + "\n" for l in lines)
            if chomp and text.endswith("\n"):
                text = text[:-1]
            return text, pos + ws + 3
        bad = src.count("\n", 0, pos) + 1
        raise JsonnetError(
            f"line {bad}: text block line must match the block's indentation"
        )


def _tokenize(src: str) -> list[tuple[str, str, int]]:
    toks: list[tuple[str, str, int]] = []
    pos = 0
    while pos < len(src):
        if src.startswith("|||", pos):
            line = src.count("\n", 0, pos) + 1
            text, pos = _scan_text_block(src, pos + 3, line)
            toks.append(("textblock", text, line))
            continue
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
        if k == "assert":
            self.next()
            cond = self.expr()
            msg = None
            if self.peek()[:2] == ("op", ":"):
                self.next()
                msg = self.expr()
            self.expect("op", ";")
            return ("assert", cond, msg, self.expr(), line)
        if k == "error":
            self.next()
            return ("error", self.expr(), line)
        return self._binary(0)

    def _bind(self) -> tuple[str, list[str] | None, Any]:
        _, name, _ = self.expect("ident")
        params = None
        if self.peek()[:2] == ("op", "("):
            params = self._params()
        self.expect("op", "=")
        return (name, params, self.expr())

    def _params(self) -> list[tuple[str, Any]]:
        # each param is (name, default_ast | None) — jsonnet optional args
        self.expect("op", "(")
        params: list[tuple[str, Any]] = []
        while self.peek()[:2] != ("op", ")"):
            name = self.expect("ident")[1]
            default = None
            if self.peek()[:2] == ("op", "="):
                self.next()
                default = self.expr()
            params.append((name, default))
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
            # `in` sits at comparison precedence (jsonnet spec)
            if (k == "op" and v in _BIN_LEVELS[level]) or (
                k == "in" and "<" in _BIN_LEVELS[level]
            ):
                self.next()
                right = self._binary(level + 1)
                left = ("bin", "in" if k == "in" else v, left, right)
            else:
                return left

    def _compspec(self) -> list[tuple]:
        clauses: list[tuple] = []
        while True:
            k, _, _ = self.peek()
            if k == "for":
                self.next()
                name = self.expect("ident")[1]
                self.expect("in")
                clauses.append(("for", name, self.expr()))
            elif k == "if":
                self.next()
                clauses.append(("if", self.expr()))
            else:
                return clauses

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
                kwargs: list[tuple[str, Any]] = []
                while self.peek()[:2] != ("op", ")"):
                    # `name = expr` is a named argument (`==` lexes as one
                    # token, so a bare `=` after an ident is unambiguous)
                    if (
                        self.peek()[0] == "ident"
                        and self.toks[self.i + 1][:2] == ("op", "=")
                    ):
                        aname = self.next()[1]
                        self.next()
                        kwargs.append((aname, self.expr()))
                    else:
                        if kwargs:
                            raise JsonnetError(
                                f"line {line}: positional argument after named"
                            )
                        args.append(self.expr())
                    if self.peek()[:2] == ("op", ","):
                        self.next()
                self.expect("op", ")")
                if self.peek()[0] == "tailstrict":
                    self.next()  # accepted and ignored (we are strict anyway)
                e = ("call", e, args, kwargs)
            elif (k, v) == ("op", "["):
                self.next()
                start = end = step = None
                is_slice = False
                if self.peek()[:2] not in (("op", ":"), ("op", "::")):
                    start = self.expr()
                if self.peek()[:2] == ("op", "::"):
                    self.next()
                    is_slice = True
                    if self.peek()[:2] != ("op", "]"):
                        step = self.expr()
                elif self.peek()[:2] == ("op", ":"):
                    self.next()
                    is_slice = True
                    if self.peek()[:2] not in (("op", "]"), ("op", ":")):
                        end = self.expr()
                    if self.peek()[:2] == ("op", ":"):
                        self.next()
                        if self.peek()[:2] != ("op", "]"):
                            step = self.expr()
                self.expect("op", "]")
                if is_slice:
                    e = ("slice", e, start, end, step)
                elif start is None:
                    raise JsonnetError(f"line {line}: empty index")
                else:
                    e = ("index", e, start)
            elif (k, v) == ("op", "{"):
                # object composition sugar: expr { ... } == expr + { ... }
                self.next()
                e = ("bin", "+", e, self._objinside(line))
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
        if k == "textblock":
            return ("str", v)
        if k in ("true", "false", "null"):
            return (k,)
        if k == "ident":
            return ("ident", v)
        if k == "self":
            return ("self", line)
        if (k, v) == ("op", "$"):
            return ("dollar", line)
        if k == "super":
            nk, nv, nl = self.next()
            if (nk, nv) == ("op", "."):
                return ("superfield", ("str", self.expect("ident")[1]), nl)
            if (nk, nv) == ("op", "["):
                key = self.expr()
                self.expect("op", "]")
                return ("superfield", key, nl)
            raise JsonnetError(
                f"line {nl}: super must be followed by '.' or '['"
            )
        if (k, v) == ("op", "("):
            e = self.expr()
            self.expect("op", ")")
            return e
        if (k, v) == ("op", "["):
            items: list[Any] = []
            while self.peek()[:2] != ("op", "]"):
                items.append(self.expr())
                if self.peek()[0] == "for" and len(items) == 1:
                    clauses = self._compspec()
                    self.expect("op", "]")
                    return ("arrcomp", items[0], clauses)
                if self.peek()[:2] == ("op", ","):
                    self.next()
                    if self.peek()[0] == "for" and len(items) == 1:
                        clauses = self._compspec()
                        self.expect("op", "]")
                        return ("arrcomp", items[0], clauses)
            self.expect("op", "]")
            return ("arr", items)
        if (k, v) == ("op", "{"):
            return self._objinside(line)
        raise JsonnetError(f"line {line}: unexpected token {v!r}")

    def _objinside(self, line: int) -> Any:
        """Object body after '{': fields (with ::/::: visibility, +: merge,
        field functions), object-level locals, asserts, or a single-field
        object comprehension. Returns ('objlit', locals, asserts, fields,
        compspec|None, line)."""
        locals_: list[tuple] = []
        asserts: list[tuple] = []
        fields: list[tuple] = []
        comp = None
        while self.peek()[:2] != ("op", "}"):
            k, v, fline = self.peek()
            if k == "for":
                comp = self._compspec()
                break
            if k == "local":
                self.next()
                locals_.append(self._bind())
            elif k == "assert":
                self.next()
                cond = self.expr()
                msg = None
                if self.peek()[:2] == ("op", ":"):
                    self.next()
                    msg = self.expr()
                asserts.append((cond, msg, fline))
            else:
                fields.append(self._objfield())
            if self.peek()[:2] == ("op", ","):
                self.next()
            elif self.peek()[0] == "for":
                comp = self._compspec()
                break
            else:
                break
        self.expect("op", "}")
        if comp is not None:
            if (
                len(fields) != 1
                or not fields[0][1]  # key must be computed: { [k]: v for.. }
                or fields[0][2] is not None
                or fields[0][3]
                or asserts
            ):
                raise JsonnetError(
                    f"line {line}: object comprehension needs exactly one "
                    "[computed]: value field (no +:, methods, or asserts)"
                )
        return ("objlit", locals_, asserts, fields, comp, line)

    def _objfield(self) -> tuple:
        """One object field: (key_ast, computed, params|None, plus, vis,
        body_ast)."""
        fk, fv, fline = self.next()
        if fk == "ident":
            key: Any = ("str", fv)
            computed = False
        elif fk == "string":
            key = ("str", _unquote(fv))
            computed = False
        elif (fk, fv) == ("op", "["):
            key = self.expr()
            self.expect("op", "]")
            computed = True
        else:
            raise JsonnetError(f"line {fline}: bad object key {fv!r}")
        params = None
        if self.peek()[:2] == ("op", "("):
            params = self._params()
        plus = False
        if self.peek()[:2] == ("op", "+"):
            self.next()
            plus = True
        nk, nv, nl = self.next()
        if (nk, nv) not in (("op", ":"), ("op", "::"), ("op", ":::")):
            raise JsonnetError(f"line {nl}: expected ':' in field, got {nv!r}")
        return (key, computed, params, plus, nv, self.expr())


# -------------------------------------------------------------- evaluator --


class _Fn:
    __slots__ = ("params", "body", "env", "name")

    def __init__(self, params, body, env, name="anonymous"):
        self.params, self.body, self.env, self.name = params, body, env, name


class _Thunk:
    """Lazily evaluated binding (object-level locals, parameter defaults) —
    forced at most once per scope by ident lookup."""

    __slots__ = ("params", "ast", "env", "name", "done", "value")

    def __init__(self, params, ast, env, name):
        self.params, self.ast, self.env, self.name = params, ast, env, name
        self.done = False
        self.value = None

    def force(self) -> Any:
        if not self.done:
            if self.params is not None:
                self.value = _Fn(self.params, self.ast, self.env, self.name)
            else:
                self.value = _eval(self.ast, self.env)
            self.done = True
        return self.value


class _FieldDef:
    __slots__ = ("vis", "plus", "params", "body", "env")

    def __init__(self, vis, plus, params, body, env=None):
        self.vis, self.plus, self.params = vis, plus, params
        self.body, self.env = body, env


class _Layer:
    __slots__ = ("fields", "locals", "asserts", "env")

    def __init__(self, fields, locals_, asserts, env):
        self.fields, self.locals = fields, locals_
        self.asserts, self.env = asserts, env


def _lookup_opt(env: dict[str, Any] | None, name: str) -> Any:
    scope = env
    while scope is not None:
        if name in scope:
            return scope[name]
        scope = scope.get("__parent__")
    return None


class _Obj:
    """A jsonnet object: an ordered stack of literal layers (rightmost
    wins), with go-jsonnet late binding — `self` in any field body refers
    to the COMPOSED object, so `{a: self.b, b: 1} + {b: 2}` gives a == 2.
    Field bodies are thunks evaluated on access and cached per resolved
    (name, layer); hidden (`::`) fields participate in lookup but are
    dropped on manifestation, exactly like go-jsonnet (the reference's VM,
    jsonnet.go:240-247)."""

    __slots__ = ("layers", "_cache", "_checked")

    def __init__(self, layers):
        self.layers = layers
        self._cache: dict[tuple[str, int], Any] = {}
        self._checked = False

    def _find(self, name: str, below: int | None = None) -> int:
        i = (len(self.layers) if below is None else below) - 1
        while i >= 0:
            if name in self.layers[i].fields:
                return i
            i -= 1
        return -1

    def field_names(self, hidden: bool = False) -> list[str]:
        vis: dict[str, bool] = {}
        for layer in self.layers:
            for n, fd in layer.fields.items():
                if fd.vis == "::":
                    vis[n] = False
                elif fd.vis == ":::":
                    vis[n] = True
                elif n not in vis:  # ':' keeps the inherited visibility
                    vis[n] = True
        return sorted(n for n, v in vis.items() if v or hidden)

    def has(self, name: str, hidden: bool = False) -> bool:
        if self._find(name) < 0:
            return False
        return hidden or name in self.field_names()

    def get(self, name: str, below: int | None = None) -> Any:
        i = self._find(name, below)
        if i < 0:
            raise JsonnetError(f"field {name!r} not found")
        key = (name, i)
        if key in self._cache:
            return self._cache[key]
        self.check_asserts()
        layer = self.layers[i]
        fd = layer.fields[name]
        env = self._member_env(layer, fd.env, i)
        if fd.body[0] == "const":
            val = fd.body[1]
        elif fd.params is not None:
            val = _Fn(fd.params, fd.body, env, name)
        else:
            val = _eval(fd.body, env)
        if fd.plus and self._find(name, below=i) >= 0:
            val = _add(self.get(name, below=i), val)
        self._cache[key] = val
        return val

    def _member_env(self, layer: _Layer, fd_env, i: int) -> dict[str, Any]:
        base = fd_env if fd_env is not None else layer.env
        env: dict[str, Any] = {
            "__parent__": base,
            "__objself__": self,
            "__objlayer__": i,
        }
        # `$` = self of the OUTERMOST lexically enclosing object: bind it
        # here only when no enclosing object already did.
        if _lookup_opt(base, "__dollar__") is None:
            env["__dollar__"] = self
        for lname, lparams, last in layer.locals:
            env[lname] = _Thunk(lparams, last, env, lname)
        return env

    def check_asserts(self) -> None:
        if self._checked:
            return
        self._checked = True  # set first: asserts may access self's fields
        for i, layer in enumerate(self.layers):
            for cond, msg, line in layer.asserts:
                env = self._member_env(layer, None, i)
                if not _truthy(_eval(cond, env)):
                    m = (
                        _to_str(_eval(msg, env))
                        if msg is not None
                        else "object assertion failed"
                    )
                    raise JsonnetError(f"line {line}: {m}")


def _as_obj(d: Any) -> _Obj:
    if isinstance(d, _Obj):
        return d
    fields = {
        k: _FieldDef(":", False, None, ("const", v))
        for k, v in d.items()
        if k != "__parent__"
    }
    return _Obj([_Layer(fields, [], [], None)])


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
    return json.dumps(_manifest(v))


def _add(a: Any, b: Any) -> Any:
    if isinstance(a, str) or isinstance(b, str):
        return _to_str(a) + _to_str(b)
    if isinstance(a, list) and isinstance(b, list):
        return a + b
    if isinstance(a, (dict, _Obj)) and isinstance(b, (dict, _Obj)):
        if isinstance(a, _Obj) or isinstance(b, _Obj):
            # late-binding object composition: stack b's layers over a's
            return _Obj(_as_obj(a).layers + _as_obj(b).layers)
        return {**a, **b}
    return a + b


def _plain(v: Any) -> Any:
    """Convert _Obj values to plain visible-field dicts (recursively) for
    the std/native builtin boundary and for == comparisons; leaves
    functions and scalars untouched."""
    if isinstance(v, _Obj):
        return _manifest(v)
    if isinstance(v, list):
        return [_plain(x) for x in v]
    if isinstance(v, dict) and not isinstance(v, _Std):
        return {k: _plain(x) for k, x in v.items() if k != "__parent__"}
    return v


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
                val = scope[name]
                if isinstance(val, _Thunk):
                    val = val.force()
                    scope[name] = val
                return val
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
    if op == "objlit":
        _, locals_, asserts, fields, comp, line = node
        flds: dict[str, _FieldDef] = {}
        if comp is None:
            for key_ast, computed, params, plus, vis, body in fields:
                keyv = _eval(key_ast, env) if computed else key_ast[1]
                if keyv is None:
                    continue  # [null]: field is elided, per the spec
                if not isinstance(keyv, str):
                    raise JsonnetError(
                        f"line {line}: object key must be a string"
                    )
                if keyv in flds:
                    raise JsonnetError(
                        f"line {line}: duplicate field {keyv!r}"
                    )
                flds[keyv] = _FieldDef(vis, plus, params, body)
        else:
            key_ast, _, _, _, vis, body = fields[0]
            for bound in _expand(comp, env):
                keyv = _eval(key_ast, bound)
                if keyv is None:
                    continue
                if not isinstance(keyv, str):
                    raise JsonnetError(
                        f"line {line}: object key must be a string"
                    )
                if keyv in flds:
                    raise JsonnetError(
                        f"line {line}: duplicate field {keyv!r} in "
                        "object comprehension"
                    )
                flds[keyv] = _FieldDef(vis, False, None, body, bound)
        return _Obj([_Layer(flds, locals_, asserts, env)])
    if op == "arr":
        return [_eval(x, env) for x in node[1]]
    if op == "arrcomp":
        return [_eval(node[1], bound) for bound in _expand(node[2], env)]
    if op == "self":
        me = _lookup_opt(env, "__objself__")
        if me is None:
            raise JsonnetError(f"line {node[1]}: self used outside an object")
        return me
    if op == "dollar":
        me = _lookup_opt(env, "__dollar__")
        if me is None:
            raise JsonnetError(f"line {node[1]}: $ used outside an object")
        return me
    if op == "superfield":
        me = _lookup_opt(env, "__objself__")
        layer = _lookup_opt(env, "__objlayer__")
        if me is None or layer is None:
            raise JsonnetError(
                f"line {node[2]}: super used outside an object"
            )
        if layer == 0:
            raise JsonnetError(
                f"line {node[2]}: attempt to use super when there is no "
                "super object"
            )
        name = _eval(node[1], env)
        if not isinstance(name, str):
            raise JsonnetError(f"line {node[2]}: super index must be a string")
        return me.get(name, below=layer)
    if op == "assert":
        _, cond, msg, rest, line = node
        if not _truthy(_eval(cond, env)):
            m = _to_str(_eval(msg, env)) if msg is not None else "assertion failed"
            raise JsonnetError(f"line {line}: {m}")
        return _eval(rest, env)
    if op == "error":
        raise JsonnetError(f"line {node[2]}: error: {_to_str(_eval(node[1], env))}")
    if op == "if":
        return _eval(node[2] if _truthy(_eval(node[1], env)) else node[3], env)
    if op == "fn":
        return _Fn(node[1], node[2], env)
    if op == "field":
        obj = _eval(node[1], env)
        if isinstance(obj, _Obj):
            return obj.get(node[2])
        if isinstance(obj, dict):
            if node[2] in obj:
                return obj[node[2]]
            if isinstance(obj, _Std):
                raise JsonnetError(f"std.{node[2]} is not supported")
        raise JsonnetError(f"field {node[2]!r} not found")
    if op == "index":
        obj = _eval(node[1], env)
        idx = _eval(node[2], env)
        if isinstance(obj, (list, str)):
            return obj[int(idx)]
        if isinstance(obj, _Obj):
            return obj.get(idx)
        if isinstance(obj, dict):
            return obj[idx]
        raise JsonnetError(f"cannot index {type(obj).__name__}")
    if op == "slice":
        seq = _eval(node[1], env)
        lo, hi, st = (
            None if x is None else int(_eval(x, env)) for x in node[2:5]
        )
        if not isinstance(seq, (list, str)):
            raise JsonnetError(f"cannot slice {type(seq).__name__}")
        return seq[lo:hi:st]
    if op == "call":
        fn = _eval(node[1], env)
        args = [_eval(a, env) for a in node[2]]
        kwargs = {k: _eval(a, env) for k, a in node[3]}
        return _apply(fn, args, kwargs)
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
        if o == "in":
            if isinstance(b, _Obj):
                return b.has(a, hidden=True)  # `in` sees hidden fields
            if isinstance(b, dict):
                return a in b and a != "__parent__"
            raise JsonnetError("'in' needs an object on the right")
        if o in ("==", "!="):
            if isinstance(a, (dict, list, _Obj)) or isinstance(
                b, (dict, list, _Obj)
            ):
                a, b = _plain(a), _plain(b)
            return (a == b) if o == "==" else (a != b)
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


def _expand(clauses: list[tuple], env: dict[str, Any]):
    """Comprehension clause expansion: yields one env per binding combo,
    left-to-right nesting with `if` filters, like the jsonnet spec."""
    if not clauses:
        yield env
        return
    head, rest = clauses[0], clauses[1:]
    if head[0] == "for":
        _, name, arr_ast = head
        arr = _eval(arr_ast, env)
        if not isinstance(arr, list):
            raise JsonnetError(
                f"comprehension 'for {name}' needs an array, got "
                f"{type(arr).__name__}"
            )
        for x in arr:
            yield from _expand(rest, {"__parent__": env, name: x})
    else:
        if _truthy(_eval(head[1], env)):
            yield from _expand(rest, env)


def _apply(fn: Any, args: list[Any], kwargs: dict[str, Any] | None = None) -> Any:
    kwargs = kwargs or {}
    if callable(fn) and not isinstance(fn, _Fn):
        # std/native builtins operate on plain JSON data, never on the
        # lazy object representation
        return fn(
            *[_plain(a) for a in args],
            **{k: _plain(v) for k, v in kwargs.items()},
        )
    if not isinstance(fn, _Fn):
        raise JsonnetError(f"not callable: {type(fn).__name__}")
    names = [p for p, _ in fn.params]
    if len(args) > len(names):
        raise JsonnetError(
            f"{fn.name}: expected at most {len(names)} argument(s), "
            f"got {len(args)}"
        )
    bound = dict(zip(names, args))
    for k, v in kwargs.items():
        if k not in names:
            raise JsonnetError(f"{fn.name}: unexpected argument {k!r}")
        if k in bound:
            raise JsonnetError(f"{fn.name}: argument {k!r} given twice")
        bound[k] = v
    child: dict[str, Any] = {"__parent__": fn.env}
    for pname, pdefault in fn.params:
        if pname in bound:
            child[pname] = bound[pname]
        elif pdefault is not None:
            # defaults are lazy and may reference other parameters
            child[pname] = _Thunk(None, pdefault, child, pname)
        else:
            raise JsonnetError(f"{fn.name}: missing argument {pname!r}")
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


def _std_uniq(arr: Any, keyF: Any = None) -> list:
    # jsonnet uniq removes CONSECUTIVE duplicates (use after sort);
    # keyF compares projected keys, like go-jsonnet (ADVICE r6: keyF was
    # accepted but silently ignored, deduping on raw equality)
    key = (lambda x: _apply(keyF, [x])) if keyF is not None else (lambda x: x)
    out: list = []
    last_key: Any = None
    for x in arr:
        k = key(x)
        if not out or last_key != k:
            out.append(x)
            last_key = k
    return out


def _std_set(arr: Any, keyF: Any = None) -> list:
    return _std_uniq(_std_sort(arr, keyF), keyF)


def _std_set_member(x: Any, s: Any, keyF: Any = None) -> bool:
    if keyF is None:
        return x in s
    kx = _apply(keyF, [x])
    return any(_apply(keyF, [e]) == kx for e in s)


def _std_set_inter(a: Any, b: Any, keyF: Any = None) -> list:
    if keyF is None:
        return _std_set([x for x in a if x in b], None)
    bk = [_apply(keyF, [y]) for y in b]
    return _std_set([x for x in a if _apply(keyF, [x]) in bk], keyF)


def _std_set_diff(a: Any, b: Any, keyF: Any = None) -> list:
    if keyF is None:
        return _std_set([x for x in a if x not in b], None)
    bk = [_apply(keyF, [y]) for y in b]
    return _std_set([x for x in a if _apply(keyF, [x]) not in bk], keyF)


def _std_prune(v: Any) -> Any:
    """Recursively drop null, empty-array, and empty-object values
    (go-jsonnet std.prune)."""
    def emptyish(x: Any) -> bool:
        return x is None or x == [] or x == {}

    if isinstance(v, dict):
        out = {
            k: _std_prune(x) for k, x in v.items() if not emptyish(x)
        }
        return {k: x for k, x in out.items() if not emptyish(x)}
    if isinstance(v, list):
        return [_std_prune(x) for x in v if not emptyish(_std_prune(x))]
    return v


def _std_manifest_json_ex(
    value: Any, indent: str, newline: str = "\n", key_val_sep: str = ": "
) -> str:
    s = json.dumps(
        value,
        indent=indent,
        separators=(",", key_val_sep),
        sort_keys=True,
        ensure_ascii=False,
    )
    return s.replace("\n", newline) if newline != "\n" else s


def _std_find_substr(pat: str, s: str) -> list:
    if not pat:
        return []
    out, i = [], s.find(pat)
    while i != -1:
        out.append(i)
        i = s.find(pat, i + 1)
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
    # go-jsonnet signature: get(o, f, default=null, inc_hidden=true);
    # the std boundary manifests objects to their visible fields, so
    # hidden (::) fields are never gettable here (documented gap)
    "get": lambda o, f, default=None, inc_hidden=True: o.get(f, default),
    # numbers
    "abs": abs,
    "max": max,
    "min": min,
    "floor": lambda x: float(__import__("math").floor(x)),
    "ceil": lambda x: float(__import__("math").ceil(x)),
    "pow": lambda x, n: float(x) ** float(n),
    "sqrt": lambda x: float(x) ** 0.5,
    "mod": lambda a, b: a % b,
    "clamp": lambda x, lo, hi: max(lo, min(x, hi)),
    "sign": lambda x: 0 if x == 0 else (1 if x > 0 else -1),
    "round": lambda x: float(__import__("math").floor(x + 0.5)),
    "exp": lambda x: __import__("math").exp(x),
    "log": lambda x: __import__("math").log(x),
    "isInteger": lambda x: isinstance(x, int) and not isinstance(x, bool)
    or (isinstance(x, float) and x == int(x)),
    "isDecimal": lambda x: isinstance(x, float) and x != int(x),
    "isEven": lambda x: int(x) % 2 == 0,
    "isOdd": lambda x: int(x) % 2 == 1,
    "foldr": lambda fn, arr, init: __import__("functools").reduce(
        lambda acc, x: _apply(fn, [x, acc]), reversed(arr), init
    ),
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
    "base64Decode": lambda s: base64.b64decode(s).decode(),
    "base64DecodeBytes": lambda s: list(base64.b64decode(s)),
    "md5": lambda s: __import__("hashlib").md5(s.encode()).hexdigest(),
    # manifestation
    "manifestJson": lambda v: _std_manifest_json_ex(v, "    "),
    "manifestJsonEx": _std_manifest_json_ex,
    "manifestJsonMinified": lambda v: json.dumps(
        v, separators=(",", ":"), sort_keys=True, ensure_ascii=False
    ),
    "escapeStringJson": lambda s: json.dumps(s, ensure_ascii=False),
    "prune": _std_prune,
    # arrays (cont.)
    "flatMap": lambda fn, arr: (
        [y for x in arr for y in _apply(fn, [x])]
        if isinstance(arr, list)
        else "".join(_apply(fn, [c]) for c in arr)
    ),
    "sum": lambda arr: sum(arr),
    "avg": lambda arr: (
        sum(arr) / len(arr)
        if arr
        else _raise(JsonnetError("std.avg: empty array"))
    ),
    "all": lambda arr: all(arr) if all(
        isinstance(x, bool) for x in arr
    ) else _raise(JsonnetError("std.all requires an array of booleans")),
    "any": lambda arr: any(arr) if all(
        isinstance(x, bool) for x in arr
    ) else _raise(JsonnetError("std.any requires an array of booleans")),
    "repeat": lambda what, count: what * int(count),
    "find": lambda value, arr: [
        i for i, x in enumerate(arr) if x == value
    ],
    "findSubstr": _std_find_substr,
    "contains": lambda arr, x: x in arr,
    # sets: sorted duplicate-free arrays
    "set": _std_set,
    "setMember": _std_set_member,
    # stable sort + keyF-aware uniq keep a's element for key ties, the
    # go-jsonnet setUnion contract
    "setUnion": lambda a, b, keyF=None: _std_set(list(a) + list(b), keyF),
    "setInter": _std_set_inter,
    "setDiff": _std_set_diff,
    # strings (cont.)
    "char": lambda n: chr(int(n)),
    "codepoint": lambda s: ord(s),
    "stripChars": lambda s, cs: s.strip(cs),
    "lstripChars": lambda s, cs: s.lstrip(cs),
    "rstripChars": lambda s, cs: s.rstrip(cs),
    "parseHex": lambda s: int(s, 16),
    "parseOctal": lambda s: int(s, 8),
    # objects (cont.)
    "mapWithKey": lambda fn, o: {
        k: _apply(fn, [k, v]) for k, v in o.items() if k != "__parent__"
    },
    "objectKeysValues": lambda o: [
        {"key": k, "value": o[k]} for k in sorted(o) if k != "__parent__"
    ],
    # debugging: print to stderr, return rest (go-jsonnet std.trace)
    "trace": lambda msg, rest: (
        print(f"TRACE: {msg}", file=sys.stderr) or rest
    ),
}


def _raise(exc: Exception) -> Any:
    raise exc


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
    """Force to JSON-able (functions cannot appear in the output). Objects
    manifest their VISIBLE fields in sorted order and run their asserts,
    like go-jsonnet; hidden (::) fields — where helper functions live —
    are dropped."""
    if isinstance(v, _Fn) or callable(v):
        raise JsonnetError("function values cannot appear in the output")
    if isinstance(v, _Obj):
        v.check_asserts()
        return {n: _manifest(v.get(n)) for n in v.field_names()}
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
