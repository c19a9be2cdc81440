"""JSONata quirk-parity suite — transcribed golden values from the
reference's path-semantics tests (builtin_test.cljc:318-644)."""

from __future__ import annotations

import pytest

from radmapper_spark import run

G = pytest.mark.parametrize("src,want")


@G([
    ("-5", -5),
    ("$x := -5", -5),
    ("($x := -5)", -5),
    ("[[1,2,3], 4].$[1]", 2),
    ("[[1,2,3], 4].$[0][0]", [1, 4]),
    ("($v := [[1,2,3], 4]; $v.$[0][0])", [1, 4]),
    ("{'num' : [[1,2,3], 4]}.num.$[0][0]", [1, 4]),
    ("[{?parent : 2}].?parent", 2),
    ("[[[1,2,3], 4]].$", [[1, 2, 3], 4]),
    ("[{'nums' : [1, 2]}, {'nums' : [3, 4]}].nums[1]", [2, 4]),
    ("{'nums' : [[1], 2, 3]}.nums[0]", [1]),
    ("[{'nums' : [1, 2]}, {'nums' : [3, 4]}].nums", [1, 2, 3, 4]),
    ("{'number' : [11, 22, 33, 44]}.number[2]", 33),
    ("['a', 'b', 'c'].[1]", [[1], [1], [1]]),
    ("{'a' : 1, 'b' : 2}.[1]", [1]),
])
def test_today_block(src, want):
    assert run(src) == want


@G([
    ("1 & 2 & 'abc'", "12abc"),
    ("[{'a' : 1}, {'a' : 2}, {'a' : 3}].a", [1, 2, 3]),
    ("[{'a' : 1}, {'a' : 2}, {'a' : 3}].(a + 1)", [2, 3, 4]),
    ("($f := function($x){$x+1}; [1,2,3].$f($))", [2, 3, 4]),
    ("{'a' : {'b' : 111}}.a.b", 111),
    ("{'a' : {'b' : {'c' : 30, 'f' : 3}}}.(a.b.c + a.b.f)", 33),
    ("{'a' : {'b' : {'c' : 30, 'f' : 3}}}.a.b.(c + f)", 33),
    ("[{'a' : 1}][0].a", 1),
    ("($c := [{'a' : 1}]; $c[0].a)", 1),
    ("[{'a' : 1}][0]", {"a": 1}),
    ("{'a' : 5, 'b' : {'e' : 2}, 'c' : [0, 10], 'd' : 500}.(a + b.e * c[1] + d )", 525),
    ("($v := [[1, 2, 3], [4]]; $v)", [[1, 2, 3], [4]]),
    ("[[1,2,3], [4]].$", [1, 2, 3, 4]),
    ("[[1,2,3], 4].$[1]", 2),
    ("($v := [[1,2,3], 4]; $v[0][0][0])", 1),
    ("{'num' : [[1,2,3], 4]}.num[0][0]", 1),
    ("{'num' : [[1,2,3], 4]}.num.$[0][0]", [1, 4]),
    ("[[1,2,3], 4].$", [1, 2, 3, 4]),
    ("[[[1,2,3], 4]].$", [[1, 2, 3], 4]),
    ("[{'a' : {'b' : {'c' : 1}}, 'd' : {'e' : 10}}].(a.b.c + d.e)", 11),
    ("{'a' : {'b' : {'c' : 1}}, 'd' : {'e' : 10}}.(a.b.c + d.e )", 11),
    ("($v := 1; $v[0])", 1),
    ("1[0]", 1),
    ("{'letter' : ['a', 'b', 'c', 'd']}.letter[$ = 'b']", "b"),
    ("[{'num' : {'x' : 1}}, {'num' : {'x' : 2}}, {'num' : {'x' : 2}}, {'num' : {'x' : 3}}].num[x = 2]",
     [{"x": 2}, {"x": 2}]),
    ("[{'num' : {'x' : 1}}, {'num' : {'x' : 2}}, {'num' : {'x' : 3}}][num.x = 2]",
     {"num": {"x": 2}}),
    ("[{'num' : {'x' : 1}}, {'num' : {'x' : 2}}, {'num' : {'x' : 3}}].[num.x = 2]",
     [[False], [True], [False]]),
])
def test_small_things(src, want):
    assert run(src) == want


def test_match_singleton_collapse():
    assert run("$match('bbfoovar', /foo/)") == {"match": "foo", "index": 2, "groups": []}
    assert run("$match('foobarxababy', /\\d*x(ab)+y/)") == \
        {"match": "xababy", "index": 6, "groups": ["ab"]}


@G([
    ("function($x){$x+1}(3)", 4),
    ("4 ~> function($x){$x+1}()", 5),
    ("[1..5] ~> $reverse()", [5, 4, 3, 2, 1]),
    ("$reduce([1..5], function($i, $j){$i + $j})", 15),
    ("$reduce([3], function($i, $j){$i + $j})", 3),
    ("$reduce([3], function($i, $j){$i + $j}, 2)", 5),
])
def test_immediate_use(src, want):
    assert run(src) == want


@G([
    ("($inc := function($i)    {$i + 1};  $map([1..5], $inc))", [2, 3, 4, 5, 6]),
    ("($add := function($i, $j){$i + $j}; $reduce([1..5], $add))", 15),
    ("($add := function($i, $j){$i + $j}; $reduce([1..5], $add, 100))", 115),
    ("($v := ['a', 'b', 'c', 'd']; $v[1])", "b"),
    ("($v := ['a', 'b', 'c', 'd']; $v[-4])", "a"),
    ("($v := ['a', 'b', 'c', 'd']; $v[0])", "a"),
])
def test_code_blocks(src, want):
    assert run(src) == want


def test_filter_delimited():
    src = """($p := [{'Phone' : {'type' : 'mobile', 'num' : '555-123-4567'}},
                     {'Phone' : {'type' : 'work',   'num' : 'XXX-123-4567'}},
                     {'Phone' : {'type' : 'mobile', 'num' : '555-333-4444'}}]; /* I'm commenting! */
              $p.Phone[type = 'mobile'] )"""
    assert run(src) == [{"type": "mobile", "num": "555-123-4567"},
                        {"type": "mobile", "num": "555-333-4444"}]


def test_map_delimited():
    src = """($p := [{'Product' : {'price' : 50, 'quantity' : 2}},
                     {'Product' : {'price' : 50, 'quantity' : 4}}];
              $p.Product.(price * quantity) )"""
    assert run(src) == [100, 200]


@G([
    ("'abc'[$]", "abc"),
    ("'abc'.$", "abc"),
    ("'abc'[0]", "abc"),
    ("$var := 3", 3),
    ("[1 , 2, 3].$", [1, 2, 3]),
    ("( $v := {'a' : {'b' : {'c' : 123}}}; $v.a.b.c.$ )", 123),
    ("[1,2,3].[$]", [[1], [2], [3]]),
    ("( $v := {'a' : {'b' : {'c' : 123}}}; $v.a.b.c )", 123),
    ("{'a' : {'b' : {'c' : 123}}}.a.b.c", 123),
    ("{'a' : {'b' : {'c' : 123}}}.a.b.c.$", 123),
    ("['a', 'b', 'c'].$sum([50, 50])", [100, 100, 100]),
    ("( $v := [1, 2, 3]; $sum($v) )", 6),
    ("($v := {'a' : 1, 'b' : 2, 'c' : 3, 'd' : 4}; $v.(a + b * c + d) )", 11),
    ("{'a' : 1, 'b' : 2, 'c' : 3, 'd' : 4}.(a + b * c + d)", 11),
    ("{'a' : 10, 'b' : 2}.(( a * (b * 2 )))", 40),
    ("((32))", 32),
    ("1 + (({'a' : 1})).((a + 44))", 46),
    ("((({'a' : 1})))[a = 1]", {"a": 1}),
    ("({'a' : 1})[a = 1]", {"a": 1}),
    ("($incAmt := 3; $inc := function($n){$n + $incAmt}; $inc(5))", 8),
    ("{'a' : 1, 'b' : 2}.($x := 3)", 3),
])
def test_design(src, want):
    assert run(src) == want


# ---- $ADDR fixture battery (builtin_test.cljc:617-644) ----
ADDR = """( $ADDR :=
     [{'name'    : 'Peter',
       'street'  : '123 Mockingbird Lane',
       'zipcode' : '20898',
       'phone'   : {'mobile' : '123-456-7890'}},
      {'name'    : 'Bill',
       'street'  : '23 Main Street',
       'zipcode' : '07010-3544'},
      {'name'    : 'Lisa',
       'street'  : '903 Forest Road',
       'zipcode' : '10878'}]; """


@G([
    (ADDR + "$ADDR.zipcode )", ["20898", "07010-3544", "10878"]),
    (ADDR + "$ADDR.zipcode[$match(/^[0-9]+$/)] )", ["20898", "10878"]),
    (ADDR + "$ADDR.phone.mobile )", "123-456-7890"),
    (ADDR + "$ADDR[name = 'Bill'].street )", "23 Main Street"),
    (ADDR + "$count($ADDR) )", 3),
])
def test_addr_battery(src, want):
    assert run(src) == want


# ---- user-data pipeline (builtin_test.cljc:647-675) ----
def test_user_data_two_source_pipeline():
    src = """( $DBa := [{'email' : 'bob@example.com', 'aAttr' : 'Bob-A-data',   'name' : 'Bob'},
                        {'email' : 'alice@alice.org', 'aAttr' : 'Alice-A-data', 'name' : 'Alice'}];
               $DBb := [{'id' : 'bob@example.com', 'bAttr' : 'Bob-B-data'},
                        {'id' : 'alice@alice.org', 'bAttr' : 'Alice-B-data'}];
               $qFn := query(){[$DBa ?e1 :email ?id]
                               [$DBb ?e2 :id    ?id]
                               [$DBa ?e1 :name  ?name]
                               [$DBa ?e1 :aAttr ?aData]
                               [$DBb ?e2 :bAttr ?bData]};
               $bSet := $qFn($DBa, $DBb);
               $eFn := express(){{?id : {'name'  : ?name,
                                         'aData' : ?aData,
                                         'bData' : ?bData}}};
               $reduce($bSet, $eFn) )"""
    assert run(src) == {
        "alice@alice.org": {"aData": "Alice-A-data", "bData": "Alice-B-data", "name": "Alice"},
        "bob@example.com": {"aData": "Bob-A-data", "bData": "Bob-B-data", "name": "Bob"}}


def test_match_no_match_is_nothing():
    assert run("$match('12345-12',/^[0-9]+$/)") is None


def test_or_value_semantics():
    assert run("$lookup({}, 'x') or '<data>'") == "<data>"
    assert run("$lookup({'x': 7}, 'x') or '<data>'") == 7


# ---- the recursive $shape pattern (builtin_test.cljc match-test, F7) ----
def test_shape_recursion():
    src = """( $spc := [{?parent: 'A', ?child: 'B'},
                        {?parent: 'A', ?child: 'C'},
                        {?parent: 'B', ?child: 'D'}];
               $children := function($spc, $p) { $spc[?parent = $p].?child };
               $shape := function($p, $spc)
                   { $reduce($children($spc, $p),
                             function($tree, $c)
                                 { $update($tree, $p,
                                           function($x) { $assoc($x, $c,
                                               $lookup($shape($c, $spc), $c) or '<data>')}) },
                             {})};
               $shape('A', $spc) )"""
    assert run(src) == {"A": {"B": {"D": "<data>"}, "C": "<data>"}}
