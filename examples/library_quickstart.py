"""
Library quickstart: alignment -> TPU Potts fit -> EC table ->
mutation-effect matrix -> contact-map plot, entirely through public
package APIs (no pipeline/config machinery).

    python examples/generate_data.py     # once
    python examples/library_quickstart.py

Everything below runs on whatever JAX backend is available (TPU chip,
or CPU with identical results).
"""

import os

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")
OUT = os.path.join(HERE, "output", "monomer")


def main():
    os.makedirs(OUT, exist_ok=True)
    msa = os.path.join(DATA, "demo_monomer.a2m")

    # --- 1. load the alignment (native C parser when built) ---
    from evcouplings_tpu.align.alignment import Alignment

    ali = Alignment.from_path(msa)
    print("alignment: {} sequences x {} sites".format(ali.N, ali.L))

    # --- 2. pseudolikelihood Potts fit (the plmc replacement) ---
    from evcouplings_tpu.couplings.fitter import run_plm

    ec_file = os.path.join(OUT, "ECs.txt")
    model_file = os.path.join(OUT, "demo.model")
    result = run_plm(
        msa, ec_file, param_file=model_file,
        focus_seq="DEMO_MONOMER/1-30",
        theta=0.8, iterations=60,
        lambda_h=0.01, lambda_J=16.0,   # already scaled by (q-1)(L-1)
    )
    print("fit: N_eff = {:.1f}, {} iterations".format(
        result.effective_samples, len(result.iteration_table)
    ))

    # --- 3. couplings model + EC scores ---
    from evcouplings_tpu.couplings.model import CouplingsModel
    from evcouplings_tpu.couplings.pairs import (
        add_mixture_probability, read_raw_ec_file
    )

    model = CouplingsModel(model_file)
    ecs = read_raw_ec_file(ec_file)
    ecs = add_mixture_probability(ecs, model="skewnormal")
    ecs = ecs.sort_values("cn", ascending=False)
    print("top ECs:")
    print(ecs.head(5).to_string(index=False))

    # --- 4. mutation-effect scan (all single substitutions) ---
    from evcouplings_tpu.mutate.calculations import single_mutant_matrix

    smm = single_mutant_matrix(model, output_column="prediction_epistatic")
    smm.to_csv(os.path.join(OUT, "single_mutants.csv"), index=False)
    worst = smm.nsmallest(3, "prediction_epistatic")
    print("most deleterious predicted mutations:")
    print(worst[["mutant", "prediction_epistatic"]].to_string(index=False))

    # --- 5. contact map of the top-L/2 ECs ---
    from evcouplings_tpu.visualize.pairs import plot_contact_map

    fig, ax = plt.subplots(figsize=(5, 5))
    plot_contact_map(ecs=ecs.head(model.L // 2), ax=ax)
    fig.savefig(os.path.join(OUT, "contact_map.png"), dpi=150)
    print("wrote", os.path.join(OUT, "contact_map.png"))


if __name__ == "__main__":
    main()
