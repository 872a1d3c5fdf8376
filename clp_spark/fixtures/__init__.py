from clp_spark.fixtures.pages import (
    TEMPLATES,
    generate_pages_pdf,
    generate_pages_df,
    write_pages_table,
    extract_text_reference,
)
