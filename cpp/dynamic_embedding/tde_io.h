// Storage-plugin C ABI for the dynamic-embedding parameter server.
//
// Role parity with the reference's IO registry
// (torchrec/csrc/dynamic_embedding/details/io_registry.h IOProvider /
// io_registry.cpp dlopen plugin loading, redis/redis_io.cpp backend):
// external row storage is pluggable behind a flat C function table so
// backends can live in separately-compiled .so files. Re-designed for
// this framework's host-side PS: synchronous push/pull over fixed-dim
// float rows (the async span/tensor machinery of the reference is a
// torch-stream concern with no analog here — the PS runs in the input
// pipeline thread).
//
// A plugin .so exports ONE symbol:
//     extern "C" const TdeIOProvider* tde_io_provider(void);
// and is loaded with tde_io_register_plugin(path).

#ifndef TORCHREC_TPU_TDE_IO_H_
#define TORCHREC_TPU_TDE_IO_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct TdeIOProvider {
  // provider name used to resolve it ("memory", "file", ...)
  const char* type;
  // cfg: provider-specific config string (e.g. a file path); dim: floats
  // per row. Returns an instance handle or NULL on failure.
  void* (*initialize)(const char* cfg, int64_t dim);
  // store n rows (overwrite-on-duplicate)
  void (*push)(void* inst, const int64_t* gids, const float* rows, int64_t n,
               int64_t dim);
  // fetch n rows; missing ids zero-fill. Returns the hit count.
  int64_t (*pull)(void* inst, const int64_t* gids, float* rows, int64_t n,
                  int64_t dim);
  // dump up to max_n stored (gid, row) pairs (checkpoint walk). Returns
  // the number written.
  int64_t (*scan)(void* inst, int64_t* gids, float* rows, int64_t max_n,
                  int64_t dim);
  int64_t (*size)(void* inst);
  void (*finalize)(void* inst);
} TdeIOProvider;

// Registry (implemented in io_registry.cc, linked into libtde.so).
// Returns 0 on success, nonzero on failure.
int tde_io_register_provider(const TdeIOProvider* provider);
// dlopen `sofile`, resolve tde_io_provider(), register the result.
int tde_io_register_plugin(const char* sofile);
// NULL if unknown.
const TdeIOProvider* tde_io_resolve(const char* name);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // TORCHREC_TPU_TDE_IO_H_
