// Quality-metric driver over the reference's evaluationLib (the offline
// stand-in for cli_evaluator, whose CLI11 dependency needs network
// FetchContent).  Mirrors src/cli_evaluator/main.cpp:19-88: read graph +
// embedding, parse the space, run Reconstruction (MAP / precision@deg)
// and EdgeDetection (F1 sweep), print one CSV header + row.
//
// Usage:
//   eval_driver <graph.edg> <embedding.csv> [embType=0] [seed=1]
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <string>
#include <vector>

#include "EdgeDetection.hpp"
#include "EmbeddingIO.hpp"
#include "GeneralGraphInfo.hpp"
#include "Graph.hpp"
#include "GraphIO.hpp"
#include "Rand.hpp"
#include "Reconstruction.hpp"

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s graph.edg embedding.csv [embType] [seed]\n", argv[0]);
        return 2;
    }
    const std::string graphPath = argv[1];
    const std::string embPath = argv[2];
    const int embType = argc > 3 ? std::atoi(argv[3]) : 0;
    const int seed = argc > 4 ? std::atoi(argv[4]) : 1;
    Rand::setSeed(seed);

    Graph g = GraphIO::readEdgeList(graphPath, "#", " ");
    std::vector<std::vector<double>> coords =
        EmbeddingIO::readCoordinatesFromFile(embPath, "%", ",");
    std::shared_ptr<Embedding> embedding = EmbeddingIO::parseEmbedding(
        static_cast<EmbeddingType>(embType), coords, 2);
    if (!embedding || embedding->getDimension() == 0) {
        std::fprintf(stderr, "embedding could not be parsed\n");
        return 1;
    }

    std::vector<std::unique_ptr<Metric>> metrics;
    metrics.push_back(std::make_unique<GeneralGraphInfo>(g));
    metrics.push_back(std::make_unique<Reconstruction>(g, embedding, 1000));
    metrics.push_back(std::make_unique<EdgeDetection>(g, embedding, 10));

    std::vector<std::string> names, values;
    for (auto& m : metrics) {
        auto n = m->getMetricNames();
        names.insert(names.end(), n.begin(), n.end());
    }
    for (auto& m : metrics) {
        auto v = m->getMetricValues();
        values.insert(values.end(), v.begin(), v.end());
    }
    Metric::printCSVToConsole(names);
    Metric::printCSVToConsole(values);
    return 0;
}
