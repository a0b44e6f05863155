from pathik_spark.kernels.canonical import (  # noqa: F401
    canonicalize_url,
    domain_name_for_file,
    filename_for,
    r2_key,
    sanitize_url,
    url_host,
    validate_url,
)
from pathik_spark.kernels.extract import extract_text, to_markdown  # noqa: F401
