// Sequential / batched-merge 2D PG-SGD ground truth for convergence bisection.
//
// Implements the path-guided 2D SGD algorithm (as described in
// reference src/algorithms/path_sgd_layout.cpp:7-431 and the SC'24 CUDA port
// src/cuda/layout.cu:190-287 — re-implemented from the algorithm, not
// translated) with three batch-apply semantics so we can measure exactly how
// batching changes converged stress vs the reference's sequential Hogwild:
//
//   mode 0: sequential (apply each pair update immediately — Gauss-Seidel)
//   mode 1: batched, per-endpoint MEAN merge (what ops/sgd.py ships)
//   mode 2: batched, per-endpoint SUM merge
//
// Usage: seq_layout2d <dump.bin> <out.bin> <mode> <batch_size> [iter_max]
//
// dump.bin layout (little-endian):
//   i64 N, i64 S, i64 P
//   i32 node_len[N]
//   i32 step_node[S]       (node rank)
//   u8  step_rev[S]
//   i64 step_pos[S]        (nucleotide offset of step start in its path)
//   i64 path_offset[P+1]
//   f64 coords0[2N][2]     (initial layout, endpoint-major: 2*rank+end)
// out.bin: f64 coords[2N][2]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <cstring>
#include <random>
#include <vector>

struct Dump {
    int64_t N, S, P;
    std::vector<int32_t> node_len, step_node;
    std::vector<uint8_t> step_rev;
    std::vector<int64_t> step_pos, path_offset;
    std::vector<double> coords;  // 2N x 2
};

static Dump load(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) { perror("open"); exit(1); }
    Dump d;
    fread(&d.N, 8, 1, f); fread(&d.S, 8, 1, f); fread(&d.P, 8, 1, f);
    d.node_len.resize(d.N); fread(d.node_len.data(), 4, d.N, f);
    d.step_node.resize(d.S); fread(d.step_node.data(), 4, d.S, f);
    d.step_rev.resize(d.S); fread(d.step_rev.data(), 1, d.S, f);
    d.step_pos.resize(d.S); fread(d.step_pos.data(), 8, d.S, f);
    d.path_offset.resize(d.P + 1); fread(d.path_offset.data(), 8, d.P + 1, f);
    d.coords.resize(4 * d.N); fread(d.coords.data(), 8, 4 * d.N, f);
    fclose(f);
    return d;
}

int main(int argc, char** argv) {
    if (argc < 5) { fprintf(stderr, "usage: %s dump out mode batch [iters]\n", argv[0]); return 2; }
    Dump d = load(argv[1]);
    int mode = atoi(argv[3]);
    int64_t batch = atoll(argv[4]);

    // per-step path id + rank (derived from path_offset)
    std::vector<int32_t> step_path(d.S), step_rank(d.S);
    for (int64_t p = 0; p < d.P; p++)
        for (int64_t s = d.path_offset[p]; s < d.path_offset[p + 1]; s++) {
            step_path[s] = (int32_t)p;
            step_rank[s] = (int32_t)(s - d.path_offset[p]);
        }
    std::vector<int64_t> path_count(d.P);
    int64_t max_steps = 1;
    for (int64_t p = 0; p < d.P; p++) {
        path_count[p] = d.path_offset[p + 1] - d.path_offset[p];
        if (path_count[p] > max_steps) max_steps = path_count[p];
    }

    // defaults: odgi layout (layout_main.cpp:198,252-266)
    int64_t iter_max = argc > 5 ? atoll(argv[5]) : 30;
    int64_t min_term_updates = 10 * d.S;
    double eta_max = (double)max_steps * (double)max_steps;
    double eps = 0.01, theta = 0.99;
    int64_t space = max_steps;
    int64_t space_max = space < 1000 ? space : 1000;
    int64_t quant = 100;
    int64_t first_cooling = (int64_t)std::floor(0.5 * (double)iter_max);

    // eta schedule (path_sgd.cpp:466-501)
    double eta_min = eps / 1.0;
    double lam = iter_max > 1 ? std::log(eta_max / eta_min) / (double)(iter_max - 1) : 0.0;
    std::vector<double> etas(iter_max);
    for (int64_t t = 0; t < iter_max; t++)
        etas[t] = eta_max * std::exp(-lam * std::abs((double)t - 0.0));

    // zeta table (path_sgd.cpp:124-138)
    int64_t n_entries = (space <= space_max ? space
                         : space_max + (space - space_max) / quant + 1) + 1;
    std::vector<double> zetas(n_entries, 0.0);
    {
        double z = 0.0;
        int64_t k = 0;
        for (int64_t i = 1; i <= space; i++) {
            z += std::pow(1.0 / (double)i, theta);
            if (i <= space_max) zetas[i] = z;
            else if ((i - space_max) % quant == 0) {
                k = space_max + 1 + (i - space_max) / quant;
                if (k < n_entries) zetas[k] = z;
            }
        }
    }
    auto zeta_of = [&](int64_t js) {
        int64_t idx = js > space_max ? space_max + 1 + (js - space_max) / quant : js;
        if (idx >= n_entries) idx = n_entries - 1;
        return zetas[idx];
    };
    double zeta2 = n_entries > 2 ? zetas[2] : 1.0;
    // closed-form inversion (layout.cu:89-113)
    auto rnd_zipf = [&](double u, int64_t n) -> int64_t {
        double zetan = zeta_of(n);
        double alpha = 1.0 / (1.0 - theta);
        double denom = 1.0 - zeta2 / zetan;
        if (denom == 0.0) denom = 1e-9;
        double eta_z = (1.0 - std::pow(2.0 / (double)n, 1.0 - theta)) / denom;
        double uz = u * zetan;
        int64_t val;
        if (uz < 1.0) val = 1;
        else if (uz < 1.0 + std::pow(0.5, theta)) val = 2;
        else val = 1 + (int64_t)((double)n * std::pow(eta_z * u - eta_z + 1.0, alpha));
        if (val > n) val = n;
        if (val < 1) val = 1;
        return val;
    };

    double* X = d.coords.data();  // (2N,2) row-major
    std::mt19937_64 gen(9399220);
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    std::uniform_int_distribution<int64_t> dis_step(0, d.S - 1);

    // batch accumulators (modes 1/2)
    std::vector<double> acc(4 * d.N, 0.0);
    std::vector<double> cnt(2 * d.N, 0.0);

    for (int64_t it = 0; it < iter_max; it++) {
        double eta = etas[it];
        bool cooling = it >= first_cooling;
        int64_t in_batch = 0;
        for (int64_t u = 0; u < min_term_updates; u++) {
            int64_t si = dis_step(gen);
            int32_t p = step_path[si];
            int64_t count = path_count[p];
            if (count == 1) continue;
            int64_t s_rank = step_rank[si];
            int64_t s2;
            if (cooling || (gen() & 1)) {
                bool backward;
                int64_t jump_space;
                if ((s_rank > 0 && (gen() & 1)) || s_rank == count - 1) {
                    backward = true; jump_space = std::min(space, s_rank);
                } else {
                    backward = false; jump_space = std::min(space, count - s_rank - 1);
                }
                int64_t z_i = rnd_zipf(unif(gen), jump_space);
                s2 = backward ? s_rank - z_i : s_rank + z_i;
            } else {
                std::uniform_int_distribution<int64_t> rando(0, count - 1);
                s2 = rando(gen);
            }
            if (s2 < 0) s2 = 0;
            if (s2 >= count) s2 = count - 1;
            int64_t sj = d.path_offset[p] + s2;

            int32_t ni = d.step_node[si], nj = d.step_node[sj];
            double pos_a = (double)d.step_pos[si], pos_b = (double)d.step_pos[sj];
            bool rev_a = d.step_rev[si], rev_b = d.step_rev[sj];
            bool flip_a = gen() & 1, flip_b = gen() & 1;
            bool other_a, other_b;
            if (flip_a) { pos_a += d.node_len[ni]; other_a = !rev_a; } else other_a = rev_a;
            if (flip_b) { pos_b += d.node_len[nj]; other_b = !rev_b; } else other_b = rev_b;

            double term_dist = std::abs(pos_a - pos_b);
            if (term_dist == 0) term_dist = 1e-9;
            double mu = eta / term_dist;
            if (mu > 1) mu = 1;
            int64_t ia = 2 * (int64_t)ni + (other_a ? 1 : 0);
            int64_t ib = 2 * (int64_t)nj + (other_b ? 1 : 0);
            double dx = X[2 * ia] - X[2 * ib];
            double dy = X[2 * ia + 1] - X[2 * ib + 1];
            if (dx == 0) dx = 1e-9;
            double mag = std::sqrt(dx * dx + dy * dy);
            double delta = mu * (mag - term_dist) / 2.0;
            double r = delta / mag;
            double rx = r * dx, ry = r * dy;
            if (mode == 0) {
                X[2 * ia] -= rx; X[2 * ia + 1] -= ry;
                X[2 * ib] += rx; X[2 * ib + 1] += ry;
            } else {
                acc[2 * ia] -= rx; acc[2 * ia + 1] -= ry; cnt[ia] += 1.0;
                acc[2 * ib] += rx; acc[2 * ib + 1] += ry; cnt[ib] += 1.0;
                if (++in_batch >= batch) {
                    for (int64_t e = 0; e < 2 * d.N; e++) {
                        if (cnt[e] > 0) {
                            double div = mode == 1 ? cnt[e] : 1.0;
                            X[2 * e] += acc[2 * e] / div;
                            X[2 * e + 1] += acc[2 * e + 1] / div;
                            acc[2 * e] = acc[2 * e + 1] = 0.0; cnt[e] = 0.0;
                        }
                    }
                    in_batch = 0;
                }
            }
        }
        if (mode != 0 && in_batch > 0) {
            for (int64_t e = 0; e < 2 * d.N; e++) {
                if (cnt[e] > 0) {
                    double div = mode == 1 ? cnt[e] : 1.0;
                    X[2 * e] += acc[2 * e] / div;
                    X[2 * e + 1] += acc[2 * e + 1] / div;
                    acc[2 * e] = acc[2 * e + 1] = 0.0; cnt[e] = 0.0;
                }
            }
        }
    }

    FILE* f = fopen(argv[2], "wb");
    fwrite(X, 8, 4 * d.N, f);
    fclose(f);
    return 0;
}
