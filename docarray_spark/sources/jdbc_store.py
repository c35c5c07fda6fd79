"""JDBC document store — the reference's SQLite backend re-expressed.

The reference persists a DocumentArray in an embedded SQL database
(``/root/reference/docarray/array/storage/sqlite/backend.py:30-120``: one
table, rows addressed by doc id, point INSERT/UPDATE/DELETE in
``storage/sqlite/getsetdel.py``). Spark's JDBC data source replaces the
hand-written CRUD: bulk reads/writes run with full executor parallelism and
predicate pushdown (filters land in the remote ``WHERE`` clause —
``PushedFilters`` on a JDBCRelation scan), while point CRUD goes through a
driver-side JDBC statement, exactly the single-row access pattern the
reference's backend serves.

Works against any JDBC URL; tests use Apache Derby embedded (ships in
Spark's jars — the same role SQLite plays for the reference: a zero-server
local SQL store). Typed columns replace the reference's serialized-blob
rows, so the stored table is queryable by ANY SQL client, not just this
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(path: str, create: bool = True) -> str:
    """Embedded-Derby URL for a local database directory."""
    return f"jdbc:derby:{path}" + (";create=true" if create else "")


def save_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = DERBY_DRIVER,
    string_type: str | None = "VARCHAR(32000)",
    **options: str,
) -> None:
    """Bulk store (the backend's ``extend``): executors write partitions in
    parallel over JDBC. ``mode='overwrite'`` replaces the table — the
    reference's list-replacement semantics; ``'append'`` adds rows.

    ``string_type``: DDL type used for string columns at table creation.
    Spark's Derby dialect defaults strings to CLOB, which Derby refuses to
    compare — breaking every pushed equality filter — so VARCHAR is forced
    unless the caller overrides (None keeps the dialect default)."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    if string_type and "createTableColumnTypes" not in options:
        scols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
        if scols:
            w = w.option(
                "createTableColumnTypes",
                ", ".join(f"{c} {string_type}" for c in scols),
            )
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


def load_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = DERBY_DRIVER,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    **options: str,
) -> DataFrame:
    """Lazy DataFrame over the stored table. Catalyst pushes filters and
    projections into the remote query (verified in tests), so
    ``find(load_jdbc(...), {...})`` reads only matching rows — the
    reference's backend-side filter pushdown (SURVEY §3.1 step 4), for
    free. Pass ``partition_column``/bounds to parallelize the read across
    executors instead of one JDBC cursor."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions or 8)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def jdbc_execute(
    spark: SparkSession,
    url: str,
    sql: str,
    driver: str | None = DERBY_DRIVER,
    params: list | tuple = (),
) -> int:
    """Driver-side JDBC statement for point CRUD / DDL — the single-row
    UPDATE/DELETE-by-id path of the reference backend
    (``storage/sqlite/getsetdel.py``); bulk mutations belong in
    ``save_jdbc``. ``params`` bind ``?`` placeholders through a
    ``PreparedStatement`` (the reference's SQLite backend is parameterized
    throughout — ADVICE r3; never interpolate values into ``sql``).
    → update count."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.prepareStatement(sql)
        try:
            for i, v in enumerate(params, start=1):
                # bool before int: bool is an int subclass in Python
                if v is None:
                    # setObject(i, null) — drivers infer the column's type;
                    # Derby rejects setNull(i, Types.NULL) outright
                    stmt.setObject(i, None)
                elif isinstance(v, bool):
                    stmt.setBoolean(i, v)
                elif isinstance(v, int):
                    stmt.setLong(i, v)
                elif isinstance(v, float):
                    stmt.setDouble(i, v)
                elif isinstance(v, (bytes, bytearray)):
                    stmt.setBytes(i, bytes(v))
                else:
                    stmt.setString(i, str(v))
            return stmt.executeUpdate()
        finally:
            stmt.close()
    finally:
        conn.close()


def _quote_ident(name: str) -> str:
    """SQL-92 double-quoted identifier (Spark's JDBC writer creates quoted
    case-sensitive names). Embedded quotes are doubled; newlines/NULs are
    never legitimate column names and are rejected outright."""
    if "\x00" in name or "\n" in name or "\r" in name:
        raise ValueError(f"invalid identifier {name!r}")
    return '"' + name.replace('"', '""') + '"'


_IDENT_PATH = __import__("re").compile(
    r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)*$"
)


def _table_ref(table: str) -> str:
    """Validated table reference: a bare/dotted identifier path, kept
    UNQUOTED so it resolves exactly like the ``dbtable`` the writer used
    (Spark passes ``dbtable`` verbatim; quoting here would flip Derby's
    case normalization). Anything that isn't a plain identifier path —
    quotes, spaces, SQL — is rejected, not executed."""
    if not _IDENT_PATH.match(table):
        raise ValueError(f"invalid table name {table!r}")
    return table


def jdbc_table_exists(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = DERBY_DRIVER,
) -> bool:
    """Catalog probe via JDBC ``DatabaseMetaData.getTables`` — portable
    across databases (no vendor system tables in the query path). Unquoted
    identifiers are case-normalized by the database (Derby/most → upper,
    Postgres → lower), so the probe checks the literal name plus both
    foldings. Used by the streaming upsert to distinguish "table not
    created yet" from real DELETE failures (round-5 verdict #2)."""
    _table_ref(table)  # validate: identifiers only, never SQL
    schema, _, name = table.rpartition(".")
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        meta = conn.getMetaData()
        for s, n in {(schema, name), (schema.upper(), name.upper()),
                     (schema.lower(), name.lower())}:
            rs = meta.getTables(None, s or None, n, None)
            try:
                if rs.next():
                    return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()


def delete_by_id_jdbc(
    spark: SparkSession, url: str, table: str, id_col: str, doc_id,
    driver: str | None = DERBY_DRIVER,
) -> int:
    """``del da[id]`` against the store (delitem.py:19-78 semantics).
    Identifiers are quote-validated, the id binds as a parameter — ids
    containing quotes are data, not SQL."""
    return jdbc_execute(
        spark, url,
        f"DELETE FROM {_table_ref(table)} WHERE {_quote_ident(id_col)} = ?",
        driver, [doc_id],
    )


def update_field_by_id_jdbc(
    spark: SparkSession, url: str, table: str, id_col: str, doc_id,
    field: str, value,
    driver: str | None = DERBY_DRIVER,
) -> int:
    """``da[id, field] = value`` against the store (setitem by id).
    Value and id bind as typed parameters (str/int/float/bool/bytes/None)."""
    return jdbc_execute(
        spark, url,
        f"UPDATE {_table_ref(table)} SET {_quote_ident(field)} = ? "
        f"WHERE {_quote_ident(id_col)} = ?",
        driver, [value, doc_id],
    )
