from clp_spark.dicts.build import (
    assign_stable_ids,
    build_logtype_dict,
    build_var_dict,
    encode_with_dicts,
)
