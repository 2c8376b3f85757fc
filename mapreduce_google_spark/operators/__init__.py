"""DataFrame → DataFrame operators.

Each module groups one operator family from SURVEY.md §2; every public
function takes DataFrames (or ``(spark, sf_dir)``) and returns a DataFrame
with aliased, deterministic output columns so results can be hash-compared
against the DuckDB oracle.
"""
