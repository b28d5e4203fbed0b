from gduns_name_match_spark.functions.normalize import (  # noqa: F401
    city_change_col,
    filter_word_col,
    normalize_city_col,
    normalize_name_col,
    preprocess_text_col,
)
from gduns_name_match_spark.functions.phonetic import (  # noqa: F401
    consonant_skeleton_col,
    metaphone_lite_col,
)
