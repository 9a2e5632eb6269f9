"""Oracle type-parity checking, shared by the test suite and the gate
rehearsal script (``scripts/gate_check.py``).

The driver hashes query results through pandas, so each DuckDB oracle column
must DESCRIBE to a type pandas renders the same way as the Spark column.
DuckDB types ``sum(int)``/``sum(bigint)`` as HUGEINT, which pandas
materializes as float64/object ("975144700.0" != "975144700") — the exact
failure that kept ``prep_winsorize`` red in rounds 3-4 while every local
value comparison passed. An uncast ``sum(int)`` in an oracle projection is
always one of these.
"""

from __future__ import annotations

_DUCK_FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT"}
_DUCK_INT = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "REAL"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def oracle_type_violations(duck_con, sql, spark_schema):
    """Type-parity check between a DuckDB oracle projection and the Spark
    result schema: the driver hashes values through pandas, so each oracle
    column must DESCRIBE to a type pandas renders the same way as the Spark
    column.  Returns a list of human-readable violations (empty = parity).

    Rules (deliberately minimal, to avoid false alarms on legit queries):
      * no HUGEINT/UHUGEINT/UBIGINT anywhere — unrepresentable in int64;
      * a Spark integral column must map to a <=64-bit DuckDB integer type
        (not DOUBLE/DECIMAL/HUGEINT);
      * a Spark float/double column must map to FLOAT/DOUBLE/REAL.
    """
    duck_types = {
        r[0]: r[1].upper() for r in duck_con.execute(f"DESCRIBE {sql}").fetchall()
    }
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    problems = []
    for col, dt in duck_types.items():
        base = dt.split("(")[0].strip()
        st = spark_types.get(col)
        if base in _DUCK_FORBIDDEN:
            problems.append(
                f"{col}: oracle type {dt} is driver-unhashable — wrap the "
                f"aggregate in CAST(... AS BIGINT)"
            )
        elif st in _SPARK_INT and base not in _DUCK_INT:
            problems.append(f"{col}: spark {st} vs oracle {dt}")
        elif st in _SPARK_FLOAT and base not in _DUCK_FLOAT:
            problems.append(f"{col}: spark {st} vs oracle {dt}")
    return problems
