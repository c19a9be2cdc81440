"""Seeded codelib (reference src/server/rm_server/libcode.clj:36-167):
every library function must be retrievable via $get, and the executable
ones must compile ($eval) and run against fixture-local data."""

from __future__ import annotations

import pytest

from radmapper_spark import run
from radmapper_spark.sources.libcode import LIBRARY_CODE, SCHEMA_LISTS, seed_catalog


@pytest.fixture(autouse=True)
def _seeded(tmp_path, monkeypatch):
    import radmapper_spark.sources.readers as readers
    path = str(tmp_path / "catalog.json")
    monkeypatch.setattr(readers, "CATALOG_PATH", path)
    seed_catalog(path)


def test_every_library_fn_retrievable_both_idents():
    for fn in LIBRARY_CODE:
        for ident in ("library_fn", "fn_name"):
            obj = run(f"$get(['{ident}', '{fn['fn_name']}'])")
            assert obj["fn_src"] == fn["fn_src"]
            assert obj["fn_doc"] == fn["fn_doc"]


def test_list_idents_mirror_reference_resolver():
    assert run("$get(['list_id','lists']).list_content") == sorted(SCHEMA_LISTS)
    assert run("$get(['list_id','library_fn']).list_content") == [
        f["fn_name"] for f in LIBRARY_CODE]


def test_addone_roundtrip():
    assert run("($f := $eval($get(['library_fn','addOne']).fn_src);"
               " $f(41))") == 42


def test_schema_parent_child_runs_on_shredded_schema():
    got = run("""
    ( $data := [{'element_name': 'Invoice',
                 'element_complexType': {'model_sequence':
                     {'model_elementDef': {'element_name': 'InvoiceLine'}}}}];
      $db := $db($data);
      $q := $eval($get(['library_fn','schemaParentChild']).fn_src);
      $q($db) )
    """)
    assert got == [{"parent": "Invoice", "child": "InvoiceLine"}]


def test_schema_shape_recursive_fn():
    got = run("""
    ( $spc := [{'parent': 'Invoice', 'child': 'InvoiceLine'},
               {'parent': 'InvoiceLine', 'child': 'Item'}];
      $shape := $eval($get(['library_fn','schemaShape']).fn_src);
      $shape('Invoice', $spc) )
    """)
    assert got == {"Invoice": {"InvoiceLine": {"Item": "<data>"}}}


def test_bie_data_parses_as_rm_literal():
    one = run("$eval($get(['library_fn','bie-1-data']).fn_src)")
    assert (one["ProcessInvoice"]["DataArea"]["Invoice"]["InvoiceHeader"]
            ["PurchaseOrderReference"]["ID"]) == "PO-1234"
    two = run("$eval($get(['library_fn','bie-2-data']).fn_src)")
    addr = (two["ProcessInvoice"]["DataArea"]["Invoice"]["InvoiceLine"]
            ["BuyerParty"]["Location"]["Address"])
    assert addr["CityName"] == "South Windsor"


def test_seed_preserves_user_entries(tmp_path):
    import radmapper_spark.sources.readers as readers
    run("$put(['fn_name','mine'], {'fn_src': 'function($x){$x*2}'})")
    seed_catalog(readers.CATALOG_PATH)  # idempotent re-seed
    assert run("($f := $eval($get(['fn_name','mine']).fn_src); $f(4))") == 8
    assert run("$get(['library_fn','addOne']).fn_doc")
