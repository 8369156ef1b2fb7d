from ungoliant_spark.functions.lines import (  # noqa: F401
    rust_lines,
    codepoint_lengths,
    byte_lengths,
)
