from sotohp_spark.functions.tokenizer import (  # noqa: F401
    KeywordRules,
    extract_keywords,
    tokenize,
    make_term_freq_udf,
    make_tokenize_udf,
)
