"""Sources ($get/$put/$getSpreadsheet/XML) and rwast AST round-trips."""

from __future__ import annotations

import json
import os

import pytest

from radmapper_spark import parse, run
from radmapper_spark.lang.rwast import from_rwast, to_rwast


# ------------------------------------------------------------ rwast
RWAST_PROGRAMS = [
    "1 + 2 * 3",
    "'a' & 'b'",
    "($x := 5; $x * 2)",
    "function($a,$b){$a+$b}(3,4)",
    "[1,2,3][0]",
    "{'a': 1}.a",
    "Account.Order.Product.(Price * Quantity)",
    "true ? 'y' : 'n'",
    "$sum([1..10])",
    "query{[?e :name ?n]}([{'name':'Bob'}])",
    "$reduce([{?id: 1}], express{{'x': [{'id': key(?id)}]}})",
    "$match('abc', /b/) ~> $exists()",
]


@pytest.mark.parametrize("src", RWAST_PROGRAMS)
def test_rwast_roundtrip_preserves_semantics(src):
    ast = parse(src)
    d = to_rwast(ast)
    json.dumps(d)  # must be JSON-serializable
    restored = from_rwast(d)
    from radmapper_spark.lang.interp import Interp
    r1 = Interp().run(src)
    ip = Interp()
    from radmapper_spark.lang.interp import Env
    from radmapper_spark.lang.values import NOMATCH, finalize
    env = Env({"$": NOMATCH, "$$": NOMATCH})
    r2 = finalize(ip.eval(restored, env))
    assert r1 == r2


# ------------------------------------------------------------ $get JSON/XML
def test_get_json(tmp_path):
    p = tmp_path / "data.json"
    p.write_text(json.dumps({"a": {"b": [1, 2, 3]}}))
    assert run(f"$get('{p}').a.b") == [1, 2, 3]


def test_get_xml(tmp_path):
    p = tmp_path / "doc.xml"
    p.write_text("<root><item id='1'><name>x</name></item>"
                 "<item id='2'><name>y</name></item></root>")
    r = run(f"$get('{p}')")
    assert r == {"root": {"item": [{"id": "1", "name": "x"},
                                   {"id": "2", "name": "y"}]}}


def test_catalog_put_get_roundtrip(tmp_path, monkeypatch):
    import radmapper_spark.sources.readers as readers
    monkeypatch.setattr(readers, "CATALOG_PATH", str(tmp_path / "cat.json"))
    run("$put(['fn_name', 'addOne'], {'fn_src': 'function($x){$x+1}', 'fn_doc': 'adds 1'})")
    obj = run("$get(['fn_name', 'addOne'])")
    assert obj["fn_doc"] == "adds 1"
    # stored function source compiles and runs ($eval — SURVEY §2.1 fn_exe)
    assert run("($f := $eval($get(['fn_name','addOne']).fn_src); $f(41))") == 42


def test_get_spreadsheet_csv(tmp_path):
    p = tmp_path / "sheet.csv"
    p.write_text("name,qty\nwidget,4\ngadget,7\n")
    r = run(f"$getSpreadsheet('{p}')")
    assert r == [{"name": "widget", "qty": 4}, {"name": "gadget", "qty": 7}]


def test_get_parquet_as_db(spark):
    r = run("( $db := $get('/root/testdata/sf0.001/region.parquet');"
            "  query{[?e :r_name ?name]}($db).?name ~> $sort() )", spark=spark)
    assert r == ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def test_schema_for():
    r = run("$schemaFor({'name': 'Bob', 'scores': [1, 2], 'addr': {'city': 'X'}})")
    assert r["name"]["type"] == "string"
    assert r["scores"]["cardinality"] == "many"
    assert r["addr"]["type"] == "ref"


def test_db_and_pull():
    r = run("( $db := $db([{'name': 'Bob', 'age': 30}]); $pull(1, $db) )")
    assert r == {"name": "Bob", "age": 30}


def test_spreadsheet_invert(tmp_path):
    p = tmp_path / "wide.csv"
    p.write_text("metric,q1,q2\nrevenue,10,20\ncost,3,4\n")
    r = run(f"$getSpreadsheet('{p}', null, true)")
    # transposed: one row per original column, keyed by first-column values
    assert len(r) == 2
    assert r[0]["metric"] == "q1"


ONHAND_XLSX = "/root/reference/data/testing/spreadsheets/on-hand.xlsx"


def test_spreadsheet_real_xlsx():
    """The REAL .xlsx path (stdlib zip+XML reader, no external engine)
    against the reference's own on-hand.xlsx fixture."""
    import os
    import pytest
    if not os.path.exists(ONHAND_XLSX):
        pytest.skip("reference fixture not present")
    r = run(f"$getSpreadsheet('{ONHAND_XLSX}')")
    assert r == [
        {"Material Item No.": "BIND-ARAM", "O.H. Qty.": 2899},
        {"Material Item No.": "F-11567", "O.H. Qty.": 893},
        {"Material Item No.": "F-13567", "O.H. Qty.": 521},
        {"Material Item No.": "F-16975", "O.H. Qty.": 19},
    ]


def test_spreadsheet_xlsx_generated(tmp_path):
    """Self-contained xlsx fixture (sharedStrings + inline numbers) built
    with the same OOXML layout Excel emits."""
    import zipfile
    p = tmp_path / "mini.xlsx"
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml",
                   f'<workbook {ns} {rns}><sheets>'
                   '<sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                   '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/sharedStrings.xml",
                   f'<sst {ns}><si><t>item</t></si><si><t>n</t></si>'
                   '<si><t>ok</t></si></sst>')
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<worksheet {ns}><sheetData>'
                   '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
                   '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>2.5</v></c></row>'
                   '</sheetData></worksheet>')
    r = run(f"$getSpreadsheet('{p}', 'Data')")
    assert r == [{"item": "ok", "n": 2.5}]

    # a MISSING named sheet must error, not silently read sheet1
    import pytest
    from radmapper_spark.sources.readers import _xlsx_matrix
    with pytest.raises(ValueError, match="NoSuch"):
        _xlsx_matrix(str(p), "NoSuch")


def test_spreadsheet_xlsx_cells_without_refs(tmp_path):
    """Cells lacking the r= attribute (some writers omit it) advance a
    running column index instead of all collapsing onto column A."""
    import zipfile
    p = tmp_path / "noref.xlsx"
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml",
                   f'<workbook {ns} {rns}><sheets>'
                   '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                   '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<worksheet {ns}><sheetData>'
                   '<row><c t="inlineStr"><is><t>a</t></is></c>'
                   '<c t="inlineStr"><is><t>b</t></is></c></row>'
                   '<row><c><v>1</v></c><c><v>2</v></c></row>'
                   '</sheetData></worksheet>')
    r = run(f"$getSpreadsheet('{p}')")
    assert r == [{"a": 1, "b": 2}]


def test_get_jsonl_distributed(spark, tmp_path):
    """$get('*.jsonl') is a distributed read -> SparkDB."""
    import json as _json
    from radmapper_spark.lang.interp import Interp
    from radmapper_spark.operators.spark_bridge import SparkDB
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for i in range(20):
            f.write(_json.dumps({"doc_id": i, "text": f"doc {i}"}) + "\n")
    out = Interp(spark).run_raw(f"$get('{p}')")
    assert isinstance(out, SparkDB)
    assert out.df.count() == 20
    assert set(out.df.columns) == {"doc_id", "text"}


def test_get_csv_table_mode(spark, tmp_path):
    """$get('*.csv', {'table': true}) -> distributed SparkDB with header
    columns, values kept as strings (no silent inference)."""
    from radmapper_spark.lang.interp import Interp
    from radmapper_spark.operators.spark_bridge import SparkDB
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,a\n2,b\n")
    out = Interp(spark).run_raw(f"$get('{p}', {{'table': true}})")
    assert isinstance(out, SparkDB)
    rows = {r.id: r.name for r in out.df.collect()}
    assert rows == {"1": "a", "2": "b"}
