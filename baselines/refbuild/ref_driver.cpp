// Parity driver over the reference's public API (include/wembed.h).
//
// Usage:
//   ref_driver <graph.edg> <out_prefix> <dim> <seed> <steps> [maxIter]
//
// Dumps (reference EmbeddingIO CSV format, weights appended):
//   <prefix>_init.csv          coordinates + weights BEFORE any step
//   <prefix>_step<k>.csv       after each of the first <steps> steps
//   <prefix>_final.csv         after calculateEmbedding() to convergence
// and prints one JSON line with losses / iteration counts / timings so the
// TPU side (baselines/parity_run.py) can replay the identical run from
// <prefix>_init.csv and compare trajectories and final quality.
#include <cstdio>
#include <cstdlib>
#include <string>

#include "wembed.h"

int main(int argc, char** argv) {
    if (argc < 6) {
        std::fprintf(stderr,
                     "usage: %s graph.edg out_prefix dim seed steps [maxIter]\n",
                     argv[0]);
        return 2;
    }
    const std::string graphPath = argv[1];
    const std::string prefix = argv[2];
    const int dim = std::atoi(argv[3]);
    const int seed = std::atoi(argv[4]);
    const int steps = std::atoi(argv[5]);
    const int maxIter = argc > 6 ? std::atoi(argv[6]) : 1000;

    wembed::setSeed(seed);
    wembed::Graph g = wembed::graphFromEdgeListFile(graphPath);
    std::fprintf(stderr, "graph: n=%d m=%d\n", g.getNumVertices(), g.getNumEdges());

    wembed::Options opts;
    opts.embeddingDimension = dim;
    opts.indexType = wembed::IndexSNN;  // sprk (Rust) is stubbed offline
    opts.maxIterations = maxIter;

    wembed::Embedder emb = wembed::createEmbedder(g, opts);
    emb.writeCoordinates(prefix + "_init.csv", true);

    // per-step losses to <prefix>_steploss.jsonl: smooth sums survive the
    // sign-chaos that makes per-coordinate lockstep meaningless (Adam's
    // first update is sign(force)*lr per coordinate)
    std::FILE* lf = std::fopen((prefix + "_steploss.jsonl").c_str(), "w");
    for (int k = 1; k <= steps; ++k) {
        emb.calculateStep();
        emb.writeCoordinates(prefix + "_step" + std::to_string(k) + ".csv", true);
        wembed::Loss l = emb.getLoss();
        std::fprintf(lf, "{\"step\": %d, \"att\": %.17g, \"rep\": %.17g}\n", k,
                     l.attractive, l.repulsive);
    }
    std::fclose(lf);
    wembed::Loss stepLoss = emb.getLoss();

    // step-driven convergence: the reference's Timings tree asserts when
    // calculateEmbedding() follows calculateStep() (duplicate "index" key,
    // Timings.cpp:41), so keep driving the same per-step API
    while (!emb.isFinished()) emb.calculateStep();
    emb.writeCoordinates(prefix + "_final.csv", true);
    wembed::Loss finalLoss = emb.getLoss();

    double totalSeconds = 0.0;
    for (const auto& t : emb.getTimings()) {
        if (t.depth == 0) totalSeconds += t.value;
    }
    std::printf(
        "{\"n\": %d, \"m\": %d, \"dim\": %d, \"seed\": %d, \"steps\": %d, "
        "\"step_att_loss\": %.17g, \"step_rep_loss\": %.17g, "
        "\"final_att_loss\": %.17g, \"final_rep_loss\": %.17g, "
        "\"total_seconds\": %.3f}\n",
        g.getNumVertices(), g.getNumEdges(), dim, seed, steps,
        stepLoss.attractive, stepLoss.repulsive, finalLoss.attractive,
        finalLoss.repulsive, totalSeconds);
    std::fputs(wembed::timingsToString(emb.getTimings()).c_str(), stderr);
    return 0;
}
