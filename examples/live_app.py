"""live_app — serve the model-in-the-loop explorer (api/live.py).

The TPU-native equivalent of the reference's reactive marimo apps
(notebooks/vcf2exp.py, vcf2risk.py): a stdlib HTTP server whose page
re-runs VCFProcessor on every interaction — gene/tissue re-selection and
in-silico variant edits (merged into the donor VCF in-process) — then
recolors the anatomagram and tables from the fresh predictions.

    python examples/live_app.py [--port 8765] [--once]

``--once`` starts the server, performs one programmatic interaction round
trip (base prediction + an in-silico edit) and exits — the scripted smoke
path for rigs without a browser.
"""

import argparse
import json
import sys
import threading
import urllib.request

from _common import artifacts_present, build_processor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()

    proc, extras = build_processor()
    from variantformer_tpu.api.live import LiveExpressionApp

    genes = None
    if not artifacts_present():
        genes = ["GENE1.1", "GENE2.1"]
    app = LiveExpressionApp(proc, vcf_path=extras["vcf"], genes=genes)

    if not args.once:
        app.serve(port=args.port)
        return

    srv = app.make_server(port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    print(f"live app at http://{host}:{port}/")

    def post(payload):
        req = urllib.request.Request(
            f"http://{host}:{port}/api/predict",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            return json.loads(resp.read())

    gene = app.genes[0]
    tissues = app.tissues[:3]
    base = post({"gene": gene, "tissues": tissues})
    print(f"base prediction ({base['seconds']}s via {base['vcf']}):")
    for t, v in base["values"].items():
        print(f"  {t:24s} {v:.4f}")

    # in-silico edit: flip the first base of the gene's first CRE region
    gencode = proc.get_genes()
    row = gencode[gencode["gene_id"] == gene].iloc[0]
    from variantformer_tpu.utils.fasta import FastaReader

    fasta = FastaReader(proc.sources.fasta_path)
    pos = int(row["start"]) + 5
    ref = fasta.fetch(row["chromosome"], pos - 1, pos).upper()
    alt = {"A": "G", "C": "T", "G": "A", "T": "C"}.get(ref)
    if alt is None:
        print("reference base ambiguous at probe position; skipping edit")
    else:
        edited = post({
            "gene": gene, "tissues": tissues,
            "edits": [{"chrom": str(row["chromosome"]), "pos": pos,
                       "ref": ref, "alt": alt, "zygosity": "hom"}],
        })
        print(f"\nwith in-silico {ref}->{alt} hom edit at "
              f"{row['chromosome']}:{pos} ({edited['seconds']}s):")
        for t, v in edited["values"].items():
            delta = v - base["values"][t]
            print(f"  {t:24s} {v:.4f}  (Δ {delta:+.5f})")
    srv.shutdown()
    srv.server_close()


if __name__ == "__main__":
    sys.exit(main())
