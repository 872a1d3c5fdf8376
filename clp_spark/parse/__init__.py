from clp_spark.parse.tokenizer import tokenize_df, PARSED_FIELDS
from clp_spark.parse.extract import extract_text_df
