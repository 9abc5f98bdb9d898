"""The ACI-domain query library — the Spark re-expression of the reference's
`ddb` crate surface (SURVEY.md §2-§3).

Every function takes a table catalog (dict of DataFrames) and filter
parameters, and returns a lazy DataFrame — the reference's QueryBuilder
predicate composition (P12) becomes plain function arguments over one shared
base plan, and MySQL's optimizer's job is Catalyst's.
"""

from aci_export_spark.queries.catalog import load_catalog

__all__ = ["load_catalog"]
