from evcouplings_tpu.mutate.calculations import (
    extract_mutations,
    predict_mutation_table,
    single_mutant_matrix,
    split_mutants,
)
