"""UDF/UDAF/UDTF surface (§2.11)."""
