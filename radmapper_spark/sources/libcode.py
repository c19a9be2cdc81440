"""Seeded codelib: the reference's public stored-function library.

The reference server pre-loads a codelib DB with library functions and
example schema data (reference: src/server/rm_server/libcode.clj:36-167)
and serves list queries over it (src/server/rm_server/resolvers.clj:66-92:
``list_id`` -> ``list_content``).  The repo has the catalog *mechanism*
(sources/readers.py catalog_get/rm_put); this module supplies the
*content*, so a user following the reference docs can run
``$get(['library_fn','addOne'])`` / ``$get(['list_id','cct_bie'])`` on
day one.

Each function is stored under BOTH ident spellings the surface accepts:
``library_fn=<name>`` (the reference resolver's ident) and
``fn_name=<name>`` (the spelling the repo's own $put/$get roundtrip
uses).  List idents mirror the reference resolver: ``list_id=lists``
enumerates the list names, ``list_id=library_fn`` the function names,
and ``list_id=cct_bie`` the BIE schema URNs (the publicly-known subset —
the four URNs the reference's own test expects;
test/rad_mapper/builtin_test.cljc:512-516).
"""

from __future__ import annotations

import json

# Example instance data from libcode.clj:6-35 (schema1/schema2), as RM
# object-literal source the way the reference stores them
# (``(bi/pprint-obj schema1)``).
_BIE_1_DATA = """\
{'ProcessInvoice':
  {'ApplicationArea': {'CreationDateTime': '2023-07-10'},
   'DataArea':
     {'Invoice':
       {'InvoiceHeader': {'PurchaseOrderReference': {'ID': 'PO-1234'}},
        'InvoiceLine':
          {'BuyerParty':
             {'Location': {'Address':
                {'AddressLine': '123 Mockingbird Lane, Gaithersburg MD, 20878'}},
              'TaxIDSet': {'ID': 'tax-id-999'}},
           'Item': {'ManufacturingParty': {'Name': 'Acme Widget'}}}},
      'Process': 'Hey new stuff!'}}}"""

_BIE_2_DATA = """\
{'ProcessInvoice':
  {'ApplicationArea': {'CreationDateTime': '2023-07-10'},
   'DataArea':
     {'Invoice':
       {'InvoiceLine':
          {'BuyerParty':
             {'Location':
               {'Address':
                 {'BuildingNumber': '111',
                  'CityName': 'South Windsor',
                  'CountryCode': 'US',
                  'PostalCode': '06074',
                  'StreetName': 'Clinton Drive'}},
              'TaxIDSet': {'ID': 'Tax-id-123'}},
           'Item': {'ManufacturingParty': {'Name': 'Acme Widget'}},
           'PurchaseOrderReference': {'ID': 'PO-ref-number-1888'}}},
      'Process': 'Some process data'}}}"""

# libcode.clj:36-167 — fn_name/fn_src/fn_doc triples, verbatim where the
# source is RM code (the library content IS the reference's public API
# surface; this is spec data, not engine code).
LIBRARY_CODE: list[dict] = [
    {"fn_name": "addOne",
     "fn_src": "function($x){$x + 1}",
     "fn_doc": ("Add one to the (numeric) argument. This is just for "
                "testing, of course.")},

    {"fn_name": "schemaParentChild",
     "fn_src": ("query{[?x     :element_name        ?parent]\n"
                "   [?x     :element_complexType ?cplx1]\n"
                "   [?cplx1 :model_sequence      ?def]\n"
                "   [?def   :model_elementDef    ?cplx2]\n"
                "   [?cplx2 :element_name        ?child]}"),
     "fn_doc": "Query a standard schema for parent/child relationships"},

    {"fn_name": "schemaRoots",
     "fn_src": ("query{[?c :schema_content   ?e]\n"
                "   [?e :model_elementDef ?d]\n"
                "   [?d :element_name     ?name]}"),
     "fn_doc": "Query a standard schema for top-level element_names"},

    {"fn_name": "schemaShape",
     "fn_src": (
         "(  $children := function($spc, $p) { $spc[?parent = $p].?child };\n"
         "   $shape := function($p, $spc) { $reduce($children($spc, $p),\n"
         "                 function($tree, $c)\n"
         "                 { $update($tree,\n"
         "                           $p,\n"
         "                           function($x) { $assoc($x, $c, "
         "$lookup($shape($c, $spc), $c) or '<data>')}) },\n"
         "                 {})})"),
     "fn_doc": ("Return the schema shape (nesting structure of elements) "
                "as used by $llmMatch")},

    {"fn_name": "bie-1-data",
     "fn_src": _BIE_1_DATA,
     "fn_doc": "Example instance data for Elena's July schema 1"},

    {"fn_name": "bie-2-data",
     "fn_src": _BIE_2_DATA,
     "fn_doc": "Example instance data for Elena's July schema 2"},
]

# resolvers.clj:75: (list_id 'lists') -> library_fn + schema types;
# builtin_test.cljc:512-516 fixes the elena subset of cct_bie.
SCHEMA_LISTS: dict[str, list[str]] = {
    "library_fn": [f["fn_name"] for f in LIBRARY_CODE],
    "cct_bie": [
        "urn:oagi-10.:elena.2023-02-09.ProcessInvoice-BC_1",
        "urn:oagi-10.:elena.2023-02-09.ProcessInvoice-BC_2",
        "urn:oagi-10.:elena.2023-07-02.ProcessInvoice-BC_1_v2",
        "urn:oagi-10.:elena.2023-07-02.ProcessInvoice-BC_2_v2",
    ],
}


def seed_catalog(path: str | None = None) -> int:
    """Write the library into the JSON catalog (idempotent; preserves any
    user-stored entries).  Returns the number of keys written."""
    from . import readers

    path = path or readers.CATALOG_PATH
    try:
        with open(path) as f:
            cat = json.load(f)
    except (OSError, ValueError):
        cat = {}
    n = 0
    for fn in LIBRARY_CODE:
        for ident in ("library_fn", "fn_name"):
            cat[f"{ident}={fn['fn_name']}"] = dict(fn)
            n += 1
    for name, content in SCHEMA_LISTS.items():
        cat[f"list_id={name}"] = {"list_content": list(content)}
        n += 1
    cat["list_id=lists"] = {"list_content": sorted(SCHEMA_LISTS)}
    n += 1
    with open(path, "w") as f:
        json.dump(cat, f, indent=1)
    return n
