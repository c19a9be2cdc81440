"""RM expression -> Catalyst Column compiler (document-at-a-time, pillar 1).

Where the local evaluator (interp.py) runs one document on the driver, this
compiler runs the same expression on EVERY ROW of a DataFrame of documents
as pure Column expressions: path navigation becomes getField/transform,
implicit array mapping becomes F.transform, filters become F.filter/
element_at, aggregates become F.aggregate — all inside whole-stage codegen,
no Python per row (SURVEY.md §4.3 "document-at-a-time expressions ...
vectorized, no shuffles").

Static-typing restriction vs the dynamic evaluator: sequence flattening is
resolved at compile time from the schema (array-of-array fields flatten;
singleton collapse is a type-level decision), so programs whose flattening
depends on runtime shapes should run on the driver path instead.

    rm_column(df, "$sum(Account.Order.Product.(Price * Quantity))")
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import ast as A
from .parser import parse


class ColumnCompileError(ValueError):
    pass


@dataclass
class CV:
    """A compiled value: Column + static type + sequence flag."""
    col: Column
    dtype: Optional[T.DataType]
    is_seq: bool = False  # array with sequence (mapping) semantics


class ColumnCompiler:
    def __init__(self, schema: T.StructType):
        self.schema = schema
        self.locals: dict = {}  # lambda params in scope -> CV

    # ---------------------------------------------------------- entry
    def compile(self, node: A.Node) -> CV:
        return self._c(node, None)

    def _c(self, node: A.Node, ctx: Optional[CV]) -> CV:
        m = getattr(self, "_c_" + type(node).__name__, None)
        if m is None:
            raise ColumnCompileError(f"not column-compilable: {type(node).__name__}")
        return m(node, ctx)

    # ---------------------------------------------------------- atoms
    def _c_Lit(self, n: A.Lit, ctx) -> CV:
        t = {bool: T.BooleanType(), int: T.LongType(), float: T.DoubleType(),
             str: T.StringType()}.get(type(n.value))
        return CV(F.lit(n.value), t)

    def _c_Var(self, n: A.Var, ctx) -> CV:
        if n.name in ("$", "$$"):
            if ctx is None:
                raise ColumnCompileError("$ refers to the row; use a field path")
            return ctx
        if n.name in self.locals:
            return self.locals[n.name]
        raise ColumnCompileError(f"unbound variable {n.name} in column expression")

    def _c_FieldRef(self, n: A.FieldRef, ctx) -> CV:
        return self._get(ctx, n.name)

    # ---------------------------------------------------------- navigation
    def _field_type(self, dtype, name: str):
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                if f.name == name:
                    return f.dataType
        return None

    def _get(self, ctx: Optional[CV], name: str) -> CV:
        if ctx is None:
            ft = self._field_type(self.schema, name)
            if ft is None:
                raise ColumnCompileError(f"no column {name!r} in schema")
            return CV(F.col(f"`{name}`"), ft)
        dt = ctx.dtype
        if isinstance(dt, T.StructType):
            ft = self._field_type(dt, name)
            if ft is None:
                raise ColumnCompileError(f"no field {name!r} in struct")
            return CV(ctx.col.getField(name), ft)
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            ft = self._field_type(dt.elementType, name)
            if ft is None:
                raise ColumnCompileError(f"no field {name!r} in array element struct")
            mapped = F.transform(ctx.col, lambda x: x.getField(name))
            if isinstance(ft, T.ArrayType):
                # implicit one-level splice of array-valued fields (jflatten)
                return CV(F.flatten(mapped), T.ArrayType(ft.elementType), True)
            return CV(mapped, T.ArrayType(ft), True)
        raise ColumnCompileError(f"cannot navigate {name!r} from {dt}")

    def _c_Path(self, n: A.Path, ctx) -> CV:
        head = n.steps[0]
        cur = self._c(head.expr, ctx)
        for f in head.filters:
            cur = self._filter(cur, f)
        for step in n.steps[1:]:
            cur = self._step(step, cur)
        return cur

    def _step(self, step: A.PathStep, cur: CV) -> CV:
        if step.kind == "get" and isinstance(step.expr, A.FieldRef):
            name = step.expr.name
            if step.filters:
                # non-compositional a.b[i]: apply the filter per element
                # BEFORE the flatten
                dt = cur.dtype
                if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
                    ft = self._field_type(dt.elementType, name)
                    if ft is None:
                        raise ColumnCompileError(f"no field {name!r}")
                    out_t, mk = self._fused_filter(ft, name, step.filters[0])
                    col = F.transform(cur.col, mk)
                    is_pred = self._static_index(step.filters[0]) is None
                    if isinstance(out_t, T.ArrayType) and is_pred:
                        # predicate filters splice (only index filters are
                        # non-compositional)
                        col = F.flatten(col)
                        out_t = out_t.elementType
                    elif is_pred:
                        # scalar field + predicate: non-matches are dropped
                        # from the sequence, not kept as nulls
                        col = F.filter(col, lambda x: x.isNotNull())
                    cv = CV(col, T.ArrayType(out_t), True)
                else:
                    cv = self._filter(self._get(cur, name), step.filters[0])
                for f in step.filters[1:]:
                    cv = self._filter(cv, f)
                return cv
            return self._get(cur, name)
        if step.kind in ("map", "get"):
            dt = cur.dtype
            if isinstance(dt, T.ArrayType):
                elem_t = dt.elementType
                body_t: list = [None]

                def body(x):
                    out = self._c(step.expr, CV(x, elem_t))
                    body_t[0] = out.dtype
                    return out.col

                col = F.transform(cur.col, body)
                if isinstance(body_t[0], T.ArrayType):
                    # sequence semantics: array-valued step results are
                    # APPENDED into the output sequence (one-level splice),
                    # e.g. [[1,2,3],[4]].$ => [1,2,3,4] — mirrors the
                    # field-access splice in _get
                    cv = CV(F.flatten(col), body_t[0], True)
                else:
                    cv = CV(col, T.ArrayType(body_t[0]) if body_t[0] else None, True)
            else:
                cv = self._c(step.expr, cur)
            for f in step.filters:
                cv = self._filter(cv, f)
            return cv
        if step.kind == "value":
            dt = cur.dtype
            if isinstance(dt, T.ArrayType):
                elem_t = dt.elementType
                body_t: list = [None]

                def body(x):
                    out = self._c(step.expr, CV(x, elem_t))
                    body_t[0] = out.dtype
                    return out.col

                col = F.transform(cur.col, body)
                return CV(col, T.ArrayType(body_t[0]) if body_t[0] else None, True)
            out = self._c(step.expr, cur)
            return out
        raise ColumnCompileError(f"unsupported step kind {step.kind}")

    def _fused_filter(self, ft, name: str, filt: A.Node):
        """Build (result_type, per-element lambda) for a.b[filter]."""
        idx = self._static_index(filt)
        if isinstance(ft, T.ArrayType):
            if idx is not None:
                pos = F.lit(idx + 1) if idx >= 0 else F.lit(idx)
                return ft.elementType, lambda x: F.element_at(x.getField(name), pos)
            elem_t = ft.elementType
            return ft, lambda x: F.filter(
                x.getField(name), lambda e: self._pred(filt, CV(e, elem_t)))
        # scalar field: [0]/[-1] selects it, others nothing
        if idx in (0, -1):
            return ft, lambda x: x.getField(name)
        if idx is not None:
            return ft, lambda x: F.lit(None)
        return ft, lambda x: F.when(self._pred(filt, CV(x.getField(name), ft)),
                                    x.getField(name))

    def _static_index(self, filt: A.Node) -> Optional[int]:
        if isinstance(filt, A.Lit) and isinstance(filt.value, (int, float)) \
                and not isinstance(filt.value, bool):
            import math
            return int(math.floor(filt.value))
        if isinstance(filt, A.UnOp) and filt.op == "-" and isinstance(filt.expr, A.Lit):
            import math
            return -int(math.floor(filt.expr.value))
        return None

    def _pred(self, filt: A.Node, elem: CV) -> Column:
        return self._c(filt, elem).col

    def _filter(self, cur: CV, filt: A.Node) -> CV:
        idx = self._static_index(filt)
        dt = cur.dtype
        if isinstance(dt, T.ArrayType):
            if idx is not None:
                pos = F.lit(idx + 1) if idx >= 0 else F.lit(idx)
                return CV(F.element_at(cur.col, pos), dt.elementType, False)
            elem_t = dt.elementType
            return CV(F.filter(cur.col, lambda e: self._pred(filt, CV(e, elem_t))),
                      dt, True)
        if idx is not None:
            return cur if idx in (0, -1) else CV(F.lit(None), dt)
        return CV(F.when(self._pred(filt, cur), cur.col), dt)

    # ---------------------------------------------------------- operators
    NUM_OPS = {"+", "-", "*", "/", "%"}
    CMP_OPS = {"=", "!=", "<", "<=", ">", ">="}

    def _c_BinOp(self, n: A.BinOp, ctx) -> CV:
        l = self._c(n.left, ctx)
        if n.op == "~>":
            # right side must compile WITH the lead arg (a bare $match(/re/)
            # etc. has a regex in arg 0 and no source otherwise)
            if isinstance(n.right, A.Call):
                return self._call(n.right, ctx, lead=l)
            raise ColumnCompileError("~> target must be a function call")
        r = self._c(n.right, ctx)
        op = n.op
        if op in self.NUM_OPS:
            is_double = op == "/" or isinstance(
                l.dtype, (T.DoubleType, T.FloatType)) or isinstance(
                r.dtype, (T.DoubleType, T.FloatType))
            if is_double:
                col = {"+": l.col + r.col, "-": l.col - r.col,
                       "*": l.col * r.col,
                       "/": l.col.cast("double") / r.col.cast("double"),
                       "%": l.col % r.col}[op]
                return CV(col, T.DoubleType())
            # integral path: operands are cast to LONG before the
            # arithmetic — the CV already DECLARED LongType, but small
            # int literals left the physical column INT32, so e.g.
            # (71*73)*(70*74*80) overflowed at 2^31 under ANSI mode
            # while the driver evaluator (Python ints) computed it fine
            # (hypothesis falsifying example, r14). RESIDUAL BOUNDARY
            # (r14 advice): the driver evaluator computes in unbounded
            # Python ints, so an all-integer product past 2^63 still
            # forks (Spark raises ANSI ARITHMETIC_OVERFLOW where the
            # driver returns the big int). The reference runs on JVM
            # longs and overflows there too, so int64 is the honest
            # language semantics; the fuzz grammar (literals in
            # [-100,100], depth<=3, max ~1e16) cannot reach the
            # boundary, and we document it rather than claim
            # full-magnitude parity.
            lc, rc = l.col.cast("long"), r.col.cast("long")
            col = {"+": lc + rc, "-": lc - rc, "*": lc * rc,
                   "%": lc % rc}[op]
            return CV(col, T.LongType())
        if op in self.CMP_OPS:
            col = {"=": l.col == r.col, "!=": l.col != r.col, "<": l.col < r.col,
                   "<=": l.col <= r.col, ">": l.col > r.col, ">=": l.col >= r.col}[op]
            return CV(col, T.BooleanType())
        if op == "and":
            # value semantics as in the driver evaluator (interp._eval_BinOp,
            # per the reference's Clojure and/or): return the DECIDING
            # operand's value, not a strict boolean. The static dtype is the
            # best-effort common type so a falsy deciding value (0, '') from
            # a mixed-numeric and/or still reads as falsy downstream.
            out_t = self._common_dtype(l.dtype, r.dtype)
            return CV(F.when(self._truthy(l), r.col).otherwise(l.col), out_t)
        if op == "or":
            out_t = self._common_dtype(l.dtype, r.dtype)
            return CV(F.when(self._truthy(l), l.col).otherwise(r.col), out_t)
        if op == "&":
            return CV(F.concat(self._str_col(l), self._str_col(r)),
                      T.StringType())
        if op == "in":
            return CV(F.array_contains(r.col, l.col), T.BooleanType())
        if op == "..":
            return CV(F.sequence(l.col, r.col), T.ArrayType(T.LongType()), True)
        raise ColumnCompileError(f"unsupported operator {op}")

    @staticmethod
    def _str_col(cv: CV) -> Column:
        """JSONata number rendering for $string and `&`: integral floats
        drop the decimal part ($string(2.0) = '2'), matching the driver's
        to_string (functions/builtins.py:74). Fractional doubles must
        render like Python's repr, NOT Java's Double.toString — the two
        produce the same shortest-roundtrip DIGITS but different
        formatting: Java goes scientific at >= 1e7 (where repr stays
        positional — a fractional double is < 2^53 so repr is positional
        everywhere down to 1e-4) and at < 1e-3 (repr switches at < 1e-4,
        and writes 'e-05' where Java writes 'E-5'). Found by the r16
        boundary fuzz ($string($sqrt(2^63-1)) forked '3.037...E9' vs
        '3037000499.97605'); the rewrite below de-scientifies /
        re-formats Java's rendering, a pure string transform on
        identical digits. Residuals: integral doubles beyond DECIMAL(38)
        (> 1e38) still fork (driver prints full digits, the cast here
        refuses), and SUBNORMALS near 5e-324 differ in DIGITS (Java's
        Double.toString is not shortest-form down there: '4.9E-324' vs
        repr's '5e-324') — both unreachable through int64-guarded
        arithmetic and the fuzz grammar."""
        if isinstance(cv.dtype, (T.DoubleType, T.FloatType)):
            d = cv.col.cast("double")
            s = d.cast("string")                   # Java rendering
            sign = F.when(s.startswith("-"), F.lit("-")).otherwise(F.lit(""))
            b = F.regexp_replace(s, "^-", "")
            rx = r"^(\d)\.(\d+)E(-?\d+)$"
            lead = F.regexp_extract(b, rx, 1)
            frac = F.regexp_extract(b, rx, 2)
            exps = F.regexp_extract(b, rx, 3)
            expn = F.when(exps != "", exps.cast("int"))
            # mantissa digits without Java's placeholder '.0'
            fracd = F.when(frac == "0", F.lit("")).otherwise(frac)
            digits = F.concat(lead, fracd)
            # positive exponent (Java emits E only at exp >= 7; a
            # FRACTIONAL double is < 2^53 so exp <= 15 and there are
            # always digits after the shifted point): positional form
            pos = F.concat(F.substring(digits, 1, expn + 1),
                           F.lit("."),
                           F.substring(digits, expn + 2, F.lit(1 << 30)))
            # exp -4: repr is still positional ('0.000' + digits);
            # exp <= -5: repr scientific, lowercase e, sign, 2+ digits
            tiny = F.concat(F.lit("0.000"), digits)
            mant = F.when(fracd == "", lead).otherwise(
                F.concat(lead, F.lit("."), frac))
            # NOT lpad: Spark's lpad TRUNCATES strings longer than the
            # target width, chopping 3-digit exponents ('e-101'->'e-10')
            es = (-expn).cast("string")
            sci = F.concat(mant, F.lit("e-"),
                           F.when(F.length(es) < 2,
                                  F.concat(F.lit("0"), es)).otherwise(es))
            frac_render = F.when(
                exps == "", b).otherwise(
                F.when(expn >= 1, pos)
                .when(expn == -4, tiny)
                .otherwise(sci))
            # integral test via %1, NOT floor: F.floor(double) returns
            # LONG, so integral doubles beyond 2^63 fell into the
            # fractional path and rendered garbage (battery find)
            return F.when((d % F.lit(1.0)) == F.lit(0.0),
                          d.cast("decimal(38,0)").cast("string")) \
                .otherwise(F.concat(sign, frac_render))
        return cv.col.cast("string")

    @staticmethod
    def _common_dtype(a, b):
        """Best-effort static common type for value-semantics and/or: equal
        types pass through, mixed numerics widen, one unknown side adopts
        the known one (Spark's own when/otherwise coercion enforces the
        runtime compatibility either way)."""
        if a == b:
            return a
        num = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType)
        if isinstance(a, num) and isinstance(b, num):
            if any(isinstance(x, (T.FloatType, T.DoubleType)) for x in (a, b)):
                return T.DoubleType()
            return T.LongType()
        return a or b

    def _truthy(self, cv: CV) -> Column:
        """JSONata truthiness by static type (mirror of values.truthy):
        false/null/0/''/empty array are falsy."""
        dt = cv.dtype
        if isinstance(dt, T.BooleanType):
            return F.coalesce(cv.col, F.lit(False))
        if isinstance(dt, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType,
                           T.ShortType, T.ByteType, T.DecimalType)):
            return cv.col.isNotNull() & (cv.col != 0)
        if isinstance(dt, T.StringType):
            return cv.col.isNotNull() & (F.length(cv.col) > 0)
        if isinstance(dt, T.ArrayType):
            return cv.col.isNotNull() & (F.size(cv.col) > 0)
        return cv.col.isNotNull()

    def _c_UnOp(self, n: A.UnOp, ctx) -> CV:
        v = self._c(n.expr, ctx)
        if n.op == "-":
            return CV(-v.col, v.dtype)
        raise ColumnCompileError(f"unsupported unary {n.op}")

    def _c_Cond(self, n: A.Cond, ctx) -> CV:
        t = self._c(n.test, ctx)
        a = self._c(n.then, ctx)
        col = F.when(t.col, a.col)
        if n.other is not None:
            b = self._c(n.other, ctx)
            col = col.otherwise(b.col)
        return CV(col, a.dtype)

    def _c_ArrayLit(self, n: A.ArrayLit, ctx) -> CV:
        items = [self._c(i, ctx) for i in n.items]
        if any(i.is_seq and isinstance(i.dtype, T.ArrayType) for i in items):
            # sequence elements SPLICE into the constructed array ([1..5] is
            # [1,2,3,4,5], not [[1,2,3,4,5]]) — concat array segments
            segs, et = [], None
            for i in items:
                if i.is_seq and isinstance(i.dtype, T.ArrayType):
                    segs.append(i.col)
                    t = i.dtype.elementType
                else:
                    segs.append(F.array(i.col))
                    t = i.dtype
                # COMMON type across all elements, not first-wins:
                # F.array/concat coerce mixed numerics to double at
                # runtime, and a declared LongType on a physically-
                # double array sent _num_agg down the integral path
                # (saturating casts turned [2^63-1, 0.0, -(2^63-1)]
                # into -1; r16 boundary fuzz find)
                et = t if et is None else self._common_dtype(et, t)
            return CV(F.concat(*segs), T.ArrayType(et) if et else None)
        et = None
        for i in items:
            et = i.dtype if et is None else self._common_dtype(et, i.dtype)
        return CV(F.array(*[i.col for i in items]), T.ArrayType(et) if et else None)

    def _c_ObjLit(self, n: A.ObjLit, ctx) -> CV:
        fields = []
        types = []
        for k, v in n.pairs:
            if not isinstance(k, A.Lit):
                raise ColumnCompileError("object keys must be literals in column mode")
            cv = self._c(v, ctx)
            fields.append(cv.col.alias(str(k.value)))
            types.append(T.StructField(str(k.value), cv.dtype or T.StringType()))
        return CV(F.struct(*fields), T.StructType(types))

    # ---------------------------------------------------------- calls
    def _c_Call(self, n: A.Call, ctx) -> CV:
        return self._call(n, ctx)

    def _num_agg(self, arr: CV, kind: str) -> CV:
        # integral arrays keep INTEGRAL sum/max/min (r16: the int64
        # boundary is defined, not documented — a double-path sum of
        # big longs silently lost low bits where the driver computes
        # exactly and Spark's LONG sum raises ANSI overflow past 2^63,
        # matching the driver's check_i64). $average stays double.
        elem_t = (arr.dtype.elementType
                  if isinstance(arr.dtype, T.ArrayType) else arr.dtype)
        integral = isinstance(
            elem_t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType))
        if integral and kind in ("sum", "max", "min"):
            col = F.transform(arr.col, lambda x: x.cast("long"))
            if kind == "sum":
                out = F.aggregate(col, F.lit(0).cast("long"),
                                  lambda a, x: a + x)
            elif kind == "max":
                out = F.array_max(col)
            else:
                out = F.array_min(col)
            return CV(out, T.LongType())
        col = F.transform(arr.col, lambda x: x.cast("double"))
        if kind == "sum":
            out = F.aggregate(col, F.lit(0.0), lambda a, x: a + x)
        elif kind == "max":
            out = F.array_max(col)
        elif kind == "min":
            out = F.array_min(col)
        else:  # average
            out = F.aggregate(col, F.lit(0.0), lambda a, x: a + x) / F.size(col)
        return CV(out, T.DoubleType())

    def _call(self, n: A.Call, ctx, lead: Optional[CV] = None) -> CV:
        if not isinstance(n.fn, A.Var):
            raise ColumnCompileError("only builtin calls compile to columns")
        name = n.fn.name
        # user-lambda HOFs compile to Catalyst higher-order functions:
        # $map/$filter(arr, function($x[,$i]){...}) -> transform / filter
        if name in ("$map", "$filter") and len(n.args) == 2 \
                and isinstance(n.args[1], A.FunDef):
            arr = self._c(n.args[0], ctx)
            fd = n.args[1]
            if not isinstance(arr.dtype, T.ArrayType):
                raise ColumnCompileError(f"{name} needs an array")
            elem_t = arr.dtype.elementType
            out_t: list = [None]

            def body(x, i=None):
                saved = dict(self.locals)
                self.locals[fd.params[0]] = CV(x, elem_t)
                if len(fd.params) > 1 and i is not None:
                    self.locals[fd.params[1]] = CV(i, T.IntegerType())
                try:
                    out = self._c(fd.body, CV(x, elem_t))
                finally:
                    self.locals = saved
                out_t[0] = out.dtype
                return out.col

            if name == "$map":
                fn2 = (lambda x, i: body(x, i)) if len(fd.params) > 1 else body
                col = F.transform(arr.col, fn2)
                return CV(col, T.ArrayType(out_t[0]) if out_t[0] else None, True)
            col = F.filter(arr.col, body)
            return CV(col, arr.dtype, arr.is_seq)
        # RegexLit/FunDef args are consumed as patterns / lambda bodies by
        # the builtin handlers below, never compiled eagerly as Columns
        args = [None if isinstance(a, (A.RegexLit, A.FunDef)) else self._c(a, ctx)
                for a in n.args]
        if lead is not None:
            args = [lead] + args
        if not args and ctx is not None:
            args = [ctx]

        def a(i):
            if args[i] is None:
                raise ColumnCompileError(
                    f"{name}: function/regex argument not column-compilable here")
            return args[i]

        if name in ("$sum", "$max", "$min", "$average"):
            return self._num_agg(a(0), name[1:])
        if name == "$count":
            dt = a(0).dtype
            if isinstance(dt, T.ArrayType):
                return CV(F.size(a(0).col).cast("long"), T.LongType())
            return CV(F.when(a(0).col.isNotNull(), 1).otherwise(0).cast("long"),
                      T.LongType())
        if name == "$distinct":
            return CV(F.array_distinct(a(0).col), a(0).dtype, a(0).is_seq)
        if name == "$reverse":
            return CV(F.reverse(a(0).col), a(0).dtype, a(0).is_seq)
        if name == "$sort":
            fd = next((x for x in n.args if isinstance(x, A.FunDef)), None)
            if fd is not None:
                # user comparator: truthy(fn(a,b)) means a sorts AFTER b
                # (reference builtin.cljc:1034-1055) -> +1/-1 comparator
                arr = a(0)
                if not isinstance(arr.dtype, T.ArrayType):
                    raise ColumnCompileError("$sort needs an array")
                elem_t = arr.dtype.elementType

                def cmp(x, y):
                    def eval_body(p0, p1):
                        saved = dict(self.locals)
                        self.locals[fd.params[0]] = CV(p0, elem_t)
                        self.locals[fd.params[1]] = CV(p1, elem_t)
                        try:
                            return self._c(fd.body, None)
                        finally:
                            self.locals = saved
                    # a TOTAL comparator: 0 when neither direction orders the
                    # pair — only +1/-1 violates TimSort's contract on
                    # arrays >= 32 elements containing equal keys
                    fwd, bwd = eval_body(x, y), eval_body(y, x)
                    return (F.when(self._truthy(fwd), F.lit(1))
                            .when(self._truthy(bwd), F.lit(-1))
                            .otherwise(F.lit(0)))

                return CV(F.array_sort(arr.col, cmp), arr.dtype, arr.is_seq)
            return CV(F.array_sort(a(0).col), a(0).dtype, a(0).is_seq)
        if name == "$append":
            return CV(F.concat(a(0).col, a(1).col), a(0).dtype, True)
        if name == "$join":
            # array_join takes a PYTHON string delimiter; a dynamic
            # separator joins via an aggregate fold instead
            arr = a(0).col
            if len(args) <= 1:
                return CV(F.array_join(arr, ""), T.StringType())
            sep_node = n.args[-1]
            if isinstance(sep_node, A.Lit):
                return CV(F.array_join(arr, str(sep_node.value)),
                          T.StringType())
            sep = args[-1].col
            col = F.when(F.size(arr) == 0, F.lit("")).otherwise(
                F.aggregate(F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
                            F.element_at(arr, 1).cast("string"),
                            lambda acc, x: F.concat(acc, sep, x.cast("string"))))
            return CV(col, T.StringType())
        if name == "$split":
            return CV(F.split(a(0).col, a(1).col), T.ArrayType(T.StringType()), True)
        if name == "$zip":
            return CV(F.arrays_zip(*[x.col for x in args]), None, True)
        if name == "$uppercase":
            return CV(F.upper(a(0).col), T.StringType())
        if name == "$lowercase":
            return CV(F.lower(a(0).col), T.StringType())
        if name == "$length":
            return CV(F.length(a(0).col).cast("long"), T.LongType())
        if name == "$trim":
            return CV(F.trim(F.regexp_replace(a(0).col, r"\s+", " ")), T.StringType())
        if name == "$substring":
            start = a(1).col
            ln = a(2).col if len(args) > 2 else F.lit(2 ** 31 - 1)
            pos = F.when(start >= 0, start + 1).otherwise(
                F.greatest(F.length(a(0).col) + start + 1, F.lit(1)))
            return CV(F.substring(a(0).col, pos, ln), T.StringType())
        if name == "$substringBefore":
            i = F.instr(a(0).col, a(1).col)
            return CV(F.when(i > 0, F.substring(a(0).col, 1, i - 1))
                      .otherwise(a(0).col), T.StringType())
        if name == "$substringAfter":
            i = F.instr(a(0).col, a(1).col)
            return CV(F.when(i > 0,
                             F.substring(a(0).col, i + F.length(a(1).col),
                                         F.lit(2 ** 31 - 1)))
                      .otherwise(a(0).col), T.StringType())
        if name == "$contains":
            if isinstance(n.args[-1], A.RegexLit):
                return CV(a(0).col.rlike(n.args[-1].pattern), T.BooleanType())
            return CV(a(0).col.contains(args[-1].col), T.BooleanType())
        if name == "$match":
            return self._match_objects(n, args, a)
        if name == "$replace":
            fd = next((x for x in n.args if isinstance(x, A.FunDef)), None)
            if fd is not None:
                return self._replace_fn(n, a(0), fd)
            # regex semantics ONLY for RegexLit args; plain strings replace
            # LITERALLY (reference/local builtin use s.replace) — passing a
            # plain string to regexp_replace would treat '.' as a wildcard
            pat_node = n.args[-2] if len(n.args) >= 2 else None
            if isinstance(pat_node, A.RegexLit):
                return CV(F.regexp_replace(a(0).col, pat_node.pattern,
                                           args[-1].col), T.StringType())
            return CV(F.replace(a(0).col, args[-2].col, args[-1].col),
                      T.StringType())
        if name == "$pad":
            # signature is (s, width[, char]); negative width pads LEFT
            # (reference builtin.cljc:525-545, local builtins._pad)
            w = a(1).col.cast("int")
            c = a(2).col if len(args) > 2 else F.lit(" ")
            s = a(0).col
            padded = F.when(
                w >= 0,
                F.when(F.length(s) >= w, s)
                .otherwise(F.call_function("rpad", s, w, c)),
            ).otherwise(
                F.when(F.length(s) >= -w, s)
                .otherwise(F.call_function("lpad", s, -w, c))
            )
            return CV(padded, T.StringType())
        if name == "$abs":
            # integral input runs in LONG like the binop path (r14):
            # F.abs on an INT32-typed literal raises ANSI integer
            # overflow at abs(-2^31) where the driver (and abs(long))
            # compute 2^31 — found by the r16 boundary fuzz
            if isinstance(a(0).dtype, (T.LongType, T.IntegerType,
                                       T.ShortType, T.ByteType)):
                return CV(F.abs(a(0).col.cast("long")), T.LongType())
            return CV(F.abs(a(0).col), a(0).dtype)
        if name == "$floor":
            return CV(F.floor(a(0).col).cast("long"), T.LongType())
        if name == "$ceil":
            return CV(F.ceil(a(0).col).cast("long"), T.LongType())
        if name == "$round":
            # HALF_EVEN like the reference. bround requires a foldable
            # scale, so non-literal precision gets an explicit banker's-
            # rounding expression.
            x = a(0).col.cast("double")
            if len(args) <= 1:
                return CV(F.bround(x, 0), T.DoubleType())
            pnode = n.args[-1]
            if isinstance(pnode, A.Lit) and isinstance(pnode.value, int):
                return CV(F.bround(x, pnode.value), T.DoubleType())
            # go through the decimal STRING rendering like bround/the driver
            # (BigDecimal.valueOf uses Double.toString), else the binary
            # double multiply drifts across the .5 tie (2.345*100 -> 234.5..03)
            dec = "decimal(38,15)"
            scale = F.pow(F.lit(10.0), args[-1].col.cast("int"))
            y = x.cast("string").cast(dec) * scale.cast(dec)
            fl = F.floor(y).cast(dec)
            frac = y - fl
            half = F.lit(0.5).cast(dec)
            even_up = F.when(F.pmod(fl.cast("long"), 2) == 0, fl).otherwise(fl + 1)
            r = F.when(frac > half, fl + 1).when(frac < half, fl).otherwise(even_up)
            return CV(r.cast("double") / scale, T.DoubleType())
        if name == "$sqrt":
            return CV(F.sqrt(a(0).col), T.DoubleType())
        if name == "$power":
            return CV(F.pow(a(0).col, a(1).col), T.DoubleType())
        if name == "$number":
            return CV(a(0).col.cast("double"), T.DoubleType())
        if name == "$string":
            return CV(self._str_col(a(0)), T.StringType())
        if name == "$boolean":
            return CV(a(0).col.cast("boolean"), T.BooleanType())
        if name == "$not":
            return CV(~a(0).col.cast("boolean"), T.BooleanType())
        if name == "$exists":
            return CV(a(0).col.isNotNull(), T.BooleanType())
        if name == "$toMillis":
            src = a(0)
            ts = src.col if isinstance(src.dtype, T.TimestampType) \
                else F.to_timestamp(src.col)
            return CV(F.unix_millis(ts), T.LongType())
        if name == "$fromMillis":
            ts = F.timestamp_millis(a(0).col.cast("long"))
            if len(args) > 1:
                fmt = _xpath_picture_to_spark(self._lit_str(n.args[-1]))
                return CV(F.date_format(ts, fmt), T.StringType())
            return CV(F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS"),
                               F.lit("Z")), T.StringType())
        raise ColumnCompileError(f"builtin {name} is not column-compilable")

    def _match_structs(self, src: Column, pattern: str):
        """Shared $match/$replace machinery: array of {match,index,groups}
        structs for every regex match, derived WITHOUT a UDF — split the
        string on the pattern, then a fold accumulates each match's start
        offset from the segment/match lengths; group captures come from
        regexp_extract_all per group (group count read from the compiled
        pattern at plan build). Returns (structs, parts, elem_t); structs
        is NULL (not empty) when the string has no match."""
        import re as _re
        ngroups = _re.compile(pattern).groups
        matches = F.regexp_extract_all(src, F.lit(pattern), F.lit(0))
        parts = F.split(src, pattern, -1)
        group_arrs = [F.regexp_extract_all(src, F.lit(pattern), F.lit(j))
                      for j in range(1, ngroups + 1)]

        def step(acc, i):
            m = F.element_at(matches, i + 1)
            obj = F.struct(
                m.alias("match"),
                acc.getField("pos").alias("index"),
                F.array(*[F.element_at(g, i + 1) for g in group_arrs])
                .alias("groups") if group_arrs
                else F.array().cast("array<string>").alias("groups"),
            )
            new_pos = (acc.getField("pos") + F.length(m)
                       + F.length(F.element_at(parts, i + 2)))
            return F.struct(new_pos.alias("pos"),
                            F.array_append(acc.getField("out"), obj).alias("out"))

        elem_t = T.StructType([
            T.StructField("match", T.StringType()),
            T.StructField("index", T.IntegerType()),
            T.StructField("groups", T.ArrayType(T.StringType())),
        ])
        init = F.struct(
            F.length(F.element_at(parts, 1)).alias("pos"),
            F.array().cast(f"array<{elem_t.simpleString()}>").alias("out"))
        folded = F.aggregate(
            F.sequence(F.lit(0), F.size(matches) - 1), init, step
        ).getField("out")
        return F.when(F.size(matches) > 0, folded), parts, elem_t

    def _match_objects(self, n: A.Call, args, a) -> CV:
        """Column twin of $match: {match,index,groups} objects (reference
        builtin.cljc:448-488)."""
        pat_node = next((x for x in n.args if isinstance(x, A.RegexLit)), None)
        if pat_node is None:
            raise ColumnCompileError("$match needs a /regex/ literal in column mode")
        limit = None
        if len(n.args) >= 2 and isinstance(n.args[-1], A.Lit) \
                and isinstance(n.args[-1].value, int):
            limit = n.args[-1].value
        folded, _parts, elem_t = self._match_structs(a(0).col, pat_node.pattern)
        if limit is not None:
            folded = F.slice(folded, 1, limit)
        return CV(folded, T.ArrayType(elem_t), True)

    def _replace_fn(self, n: A.Call, src: CV, fd: A.FunDef) -> CV:
        """Fn-valued $replace (reference builtin.cljc:548-605; driver twin
        functions/builtins.py:243-251): the replacement function receives
        each {match,index,groups} object and returns a string. Column-pure
        bodies compile entirely in Catalyst: match structs -> F.transform
        of the body -> interleave with the split segments. Bodies that
        aren't column-compilable fall back to an Arrow-batched pandas UDF
        running the driver evaluator (SURVEY §2.8's prescribed fallback)."""
        fd_idx = n.args.index(fd)
        pat_node = n.args[fd_idx - 1] if fd_idx >= 1 else None
        limit_node = n.args[fd_idx + 1] if len(n.args) > fd_idx + 1 else None
        if not isinstance(pat_node, A.RegexLit):
            # literal-string pattern + fn replacement: the driver evaluator
            # returns the string unchanged (builtins.py:239)
            return CV(src.col.cast("string"), T.StringType())
        pattern = pat_node.pattern
        lim = self._c(limit_node, None).col.cast("int") \
            if limit_node is not None else None
        try:
            structs, parts, elem_t = self._match_structs(src.col, pattern)

            def body(mo):
                saved = dict(self.locals)
                self.locals[fd.params[0]] = CV(mo, elem_t)
                try:
                    out = self._c(fd.body, CV(mo, elem_t))
                finally:
                    self.locals = saved
                return out.col.cast("string")

            if lim is not None:
                # count semantics of the driver twin: limit<=0 replaces all
                repls = F.transform(structs, lambda mo, i: F.when(
                    (lim <= 0) | (i < lim), body(mo))
                    .otherwise(mo.getField("match")))
            else:
                repls = F.transform(structs, body)
            tail = F.zip_with(repls, F.slice(parts, 2, F.size(parts)),
                              lambda r, p: F.concat(r, p))
            out_col = F.concat(F.element_at(parts, 1),
                               F.coalesce(F.array_join(tail, ""), F.lit("")))
            return CV(out_col, T.StringType())
        except ColumnCompileError:
            return self._replace_fn_udf(src, pattern, fd, limit_node)

    def _replace_fn_udf(self, src: CV, pattern: str, fd: A.FunDef,
                        limit_node) -> CV:
        """Pandas-UDF fallback for non-column-pure replacement bodies: the
        FunDef AST ships as PLAIN data (dict/list tree) so the closure
        unpickles without radmapper_spark on the worker path; the evaluator
        import happens lazily inside the batch fn after a sys.path
        bootstrap (in a cluster, ship the package via --py-files/pip —
        standard for any Python-package UDF)."""
        import dataclasses as _dc
        import os

        import pandas as _pd
        from pyspark.sql.functions import pandas_udf

        def plain(node):
            if isinstance(node, A.Node):
                return {"__ast__": type(node).__name__,
                        **{f.name: plain(getattr(node, f.name))
                           for f in _dc.fields(node)}}
            if isinstance(node, list):
                return [plain(x) for x in node]
            return node

        fd_plain = plain(fd)
        count = 0
        if isinstance(limit_node, A.Lit) and isinstance(limit_node.value, int):
            count = max(0, limit_node.value)
        elif limit_node is not None:
            raise ColumnCompileError(
                "$replace: non-literal limit with a non-column-pure "
                "replacement function is not supported in column mode")
        pkg_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))

        def do_replace(batch):
            import re as _re
            import sys
            if pkg_root not in sys.path:
                sys.path.insert(0, pkg_root)
            from radmapper_spark.lang import ast as _A
            from radmapper_spark.lang.interp import Env, Interp
            from radmapper_spark.lang.values import NOMATCH, jflatten

            def restore(d):
                if isinstance(d, dict) and "__ast__" in d:
                    cls = getattr(_A, d["__ast__"])
                    return cls(**{k: restore(v) for k, v in d.items()
                                  if k != "__ast__"})
                if isinstance(d, list):
                    return [restore(x) for x in d]
                return d

            ip = Interp()
            env = Env({"$": NOMATCH, "$$": NOMATCH})
            fnv = ip.eval(restore(fd_plain), env)
            rx = _re.compile(pattern)

            def one(s):
                if s is None:
                    return None

                def sub(m):
                    obj = {"match": m.group(0), "index": m.start(),
                           "groups": list(m.groups())}
                    r = jflatten(ip.call(fnv, [obj], env))
                    if not isinstance(r, str):
                        raise ValueError("$replace function must return a string")
                    return r

                return rx.sub(sub, s, count=count)

            return batch.map(one)

        do_replace.__annotations__ = {"batch": _pd.Series, "return": _pd.Series}
        return CV(pandas_udf(do_replace, "string")(src.col), T.StringType())

    def _lit_str(self, node) -> str:
        if isinstance(node, A.Lit):
            return str(node.value)
        raise ColumnCompileError("expected literal")


def _xpath_picture_to_spark(pic: str) -> str:
    """XPath datetime picture -> Spark date_format pattern (subset,
    mirrors functions/builtins._translate_picture)."""
    for a, b in [("[Y0001]", "yyyy"), ("[Y01]", "yy"), ("[Y]", "yyyy"),
                 ("[M01]", "MM"), ("[M]", "M"), ("[D01]", "dd"), ("[D]", "d"),
                 ("[H01]", "HH"), ("[H]", "H"), ("[m01]", "mm"), ("[m]", "m"),
                 ("[s01]", "ss"), ("[s]", "s")]:
        pic = pic.replace(a, b)
    return pic


def rm_column(df: DataFrame, src: str) -> Column:
    """Compile an RM expression to a Column over df's schema."""
    node = parse(src)
    return ColumnCompiler(df.schema).compile(node).col


def rm_select(df: DataFrame, **exprs: str) -> DataFrame:
    """df.select of compiled RM expressions: rm_select(df, total='$sum(a.b)')."""
    cols = [rm_column(df, src).alias(name) for name, src in exprs.items()]
    return df.select(*cols)
