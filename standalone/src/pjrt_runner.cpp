// PJRT-C-API kernel runner: executes the REAL compiled flash-attention
// kernel with no Python in the loop (completing the reference
// `standalone/src/flash_api.cu` + `src/main.cpp` role of running the
// actual kernel framework-free; on TPU the kernel exists as a serialized
// XLA/Mosaic executable, so "framework-free" means PJRT C API).
//
// Usage:
//   fa_pjrt_runner run <executable.bin> <case.bin> <out_case.bin> \
//       [plugin.so]
//
// * <executable.bin>: serialized PJRT executable produced by
//   standalone/tools/export_executable.py (AOT jax.jit lowering of the
//   Pallas forward, fp32 in/out).
// * <case.bin>:  FATPU1 attention dump (see utils/standalone_io.py); only
//   q/k/v are consumed.
// * <out_case.bin>: the same case rewritten with the on-device kernel's
//   out/lse — feed it to `fa_standalone check` to compare against the
//   C++ fp32 oracle.
// * plugin.so defaults to $PJRT_PLUGIN or /opt/axon/libaxon_pjrt.so.

#include <dlfcn.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

struct CaseHeader {
  int32_t b, h, hk, sq, sk, d, dv, causal, wl, wr, has_alibi, flags;
  float scale, softcap;
};

constexpr char kMagic[8] = {'F', 'A', 'T', 'P', 'U', '1', 0, 0};

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "fa_pjrt_runner: %s\n", msg.c_str());
  std::exit(1);
}

void Check(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  Die(std::string(what) + ": " + msg);
}

std::vector<char> ReadFile(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) Die(std::string("cannot open ") + path);
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(n);
  if (std::fread(buf.data(), 1, n, f) != size_t(n)) Die("short read");
  std::fclose(f);
  return buf;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5 || std::string(argv[1]) != "run") {
    std::fprintf(stderr,
                 "usage: %s run <executable.bin> <case.bin> <out_case.bin> "
                 "[plugin.so]\n",
                 argv[0]);
    return 2;
  }
  const char* exe_path = argv[2];
  const char* case_path = argv[3];
  const char* out_path = argv[4];
  const char* plugin = argc > 5 ? argv[5] : nullptr;
  if (!plugin) plugin = std::getenv("PJRT_PLUGIN");
  if (!plugin) plugin = "/opt/axon/libaxon_pjrt.so";

  // ---- load the case ----
  std::vector<char> dump = ReadFile(case_path);
  if (dump.size() < 8 + sizeof(CaseHeader) ||
      std::memcmp(dump.data(), kMagic, 8) != 0)
    Die("bad case file magic");
  CaseHeader hdr;
  std::memcpy(&hdr, dump.data() + 8, sizeof(hdr));
  const size_t nq = size_t(hdr.b) * hdr.sq * hdr.h * hdr.d;
  const size_t nk = size_t(hdr.b) * hdr.sk * hdr.hk * hdr.d;
  const size_t nv = size_t(hdr.b) * hdr.sk * hdr.hk * hdr.dv;
  const size_t no = size_t(hdr.b) * hdr.sq * hdr.h * hdr.dv;
  const size_t nl = size_t(hdr.b) * hdr.h * hdr.sq;
  const float* q = reinterpret_cast<const float*>(dump.data() + 8 +
                                                  sizeof(CaseHeader));
  const float* k = q + nq;
  const float* v = k + nk;
  // out/lse live at the END of the file (after optional alibi/seqused)
  float* out_dst = reinterpret_cast<float*>(
      dump.data() + dump.size() - (no + nl) * sizeof(float));
  float* lse_dst = out_dst + no;

  // ---- bring up PJRT ----
  void* lib = dlopen(plugin, RTLD_NOW | RTLD_LOCAL);
  if (!lib) Die(std::string("dlopen ") + plugin + ": " + dlerror());
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(lib, "GetPjrtApi"));
  if (!get_api) Die("plugin has no GetPjrtApi");
  const PJRT_Api* api = get_api();

  if (api->PJRT_Plugin_Initialize) {
    PJRT_Plugin_Initialize_Args ia;
    std::memset(&ia, 0, sizeof(ia));
    ia.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    Check(api, api->PJRT_Plugin_Initialize(&ia), "plugin init");
  }

  // Plugin create options (the axon plugin requires topology/session_id;
  // a stock libtpu plugin ignores unknown options).  Overridable via env.
  const char* topo = std::getenv("PJRT_TOPOLOGY");
  if (!topo) topo = "v5e:1x1x1";
  std::string session = "fa-pjrt-runner-";
  session += std::to_string(::getpid());
  const char* remote_compile_env = std::getenv("PALLAS_AXON_REMOTE_COMPILE");
  bool remote_compile = remote_compile_env &&
                        std::string(remote_compile_env) == "1";
  std::vector<PJRT_NamedValue> opts;
  auto add_str = [&](const char* name, const char* value) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = name;
    v.name_size = std::strlen(name);
    v.type = PJRT_NamedValue_kString;
    v.string_value = value;
    v.value_size = std::strlen(value);
    opts.push_back(v);
  };
  auto add_bool = [&](const char* name, bool value) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = name;
    v.name_size = std::strlen(name);
    v.type = PJRT_NamedValue_kBool;
    v.bool_value = value;
    v.value_size = 1;
    opts.push_back(v);
  };
  add_str("topology", topo);
  add_str("session_id", session.c_str());
  add_bool("remote_compile", remote_compile);

  PJRT_Client_Create_Args ca;
  std::memset(&ca, 0, sizeof(ca));
  ca.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  ca.create_options = opts.data();
  ca.num_options = opts.size();
  Check(api, api->PJRT_Client_Create(&ca), "client create");
  PJRT_Client* client = ca.client;

  PJRT_Client_AddressableDevices_Args da;
  std::memset(&da, 0, sizeof(da));
  da.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  da.client = client;
  Check(api, api->PJRT_Client_AddressableDevices(&da), "devices");
  if (da.num_addressable_devices == 0) Die("no addressable devices");
  PJRT_Device* device = da.addressable_devices[0];

  // ---- deserialize + load the executable ----
  std::vector<char> exe_bytes = ReadFile(exe_path);
  PJRT_Executable_DeserializeAndLoad_Args la;
  std::memset(&la, 0, sizeof(la));
  la.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
  la.client = client;
  la.serialized_executable = exe_bytes.data();
  la.serialized_executable_size = exe_bytes.size();
  Check(api, api->PJRT_Executable_DeserializeAndLoad(&la), "deserialize");
  PJRT_LoadedExecutable* exe = la.loaded_executable;

  // ---- host -> device ----
  auto to_device = [&](const float* data, std::vector<int64_t> dims) {
    PJRT_Client_BufferFromHostBuffer_Args ba;
    std::memset(&ba, 0, sizeof(ba));
    ba.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    ba.client = client;
    ba.data = data;
    ba.type = PJRT_Buffer_Type_F32;
    ba.dims = dims.data();
    ba.num_dims = dims.size();
    ba.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    ba.device = device;
    Check(api, api->PJRT_Client_BufferFromHostBuffer(&ba), "h2d");
    // wait for the transfer-done event
    PJRT_Event_Await_Args ea;
    std::memset(&ea, 0, sizeof(ea));
    ea.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    ea.event = ba.done_with_host_buffer;
    Check(api, api->PJRT_Event_Await(&ea), "h2d await");
    PJRT_Event_Destroy_Args ed;
    std::memset(&ed, 0, sizeof(ed));
    ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    ed.event = ba.done_with_host_buffer;
    api->PJRT_Event_Destroy(&ed);
    return ba.buffer;
  };

  PJRT_Buffer* qb = to_device(q, {hdr.b, hdr.sq, hdr.h, hdr.d});
  PJRT_Buffer* kb = to_device(k, {hdr.b, hdr.sk, hdr.hk, hdr.d});
  PJRT_Buffer* vb = to_device(v, {hdr.b, hdr.sk, hdr.hk, hdr.dv});

  // ---- execute ----
  PJRT_Buffer* argv_bufs[3] = {qb, kb, vb};
  PJRT_Buffer* const* arg_lists[1] = {argv_bufs};
  std::vector<PJRT_Buffer*> out_bufs(2, nullptr);
  PJRT_Buffer** out_lists[1] = {out_bufs.data()};
  PJRT_ExecuteOptions exec_opts;
  std::memset(&exec_opts, 0, sizeof(exec_opts));
  exec_opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_LoadedExecutable_Execute_Args xa;
  std::memset(&xa, 0, sizeof(xa));
  xa.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  xa.executable = exe;
  xa.options = &exec_opts;
  xa.argument_lists = arg_lists;
  xa.num_devices = 1;
  xa.num_args = 3;
  xa.output_lists = out_lists;
  Check(api, api->PJRT_LoadedExecutable_Execute(&xa), "execute");

  // ---- device -> host ----
  // The executable may keep outputs in a device-preferred (transposed/
  // tiled) layout; request an explicit dense row-major host layout so the
  // dump bytes are logical order.
  auto to_host = [&](PJRT_Buffer* buf, float* dst, size_t count,
                     size_t ndims) {
    std::vector<int64_t> m2m(ndims);
    for (size_t i = 0; i < ndims; ++i) m2m[i] = int64_t(ndims - 1 - i);
    PJRT_Buffer_MemoryLayout layout;
    std::memset(&layout, 0, sizeof(layout));
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    layout.tiled.minor_to_major = m2m.data();
    layout.tiled.minor_to_major_size = ndims;
    PJRT_Buffer_ToHostBuffer_Args ha;
    std::memset(&ha, 0, sizeof(ha));
    ha.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    ha.src = buf;
    ha.host_layout = &layout;
    ha.dst = dst;
    ha.dst_size = count * sizeof(float);
    Check(api, api->PJRT_Buffer_ToHostBuffer(&ha), "d2h");
    PJRT_Event_Await_Args ea;
    std::memset(&ea, 0, sizeof(ea));
    ea.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    ea.event = ha.event;
    Check(api, api->PJRT_Event_Await(&ea), "d2h await");
    PJRT_Event_Destroy_Args ed;
    std::memset(&ed, 0, sizeof(ed));
    ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    ed.event = ha.event;
    api->PJRT_Event_Destroy(&ed);
  };

  // The exported executable returns FLATTENED (1-D) outputs (see
  // tools/export_executable.py), so the requested host layout must be
  // rank 1 to match the buffer rank (PJRT requires minor_to_major_size
  // == rank; a strict plugin rejects a mismatched layout).
  to_host(out_bufs[0], out_dst, no, 1);
  to_host(out_bufs[1], lse_dst, nl, 1);

  // ---- rewrite the case with the real kernel's outputs ----
  FILE* f = std::fopen(out_path, "wb");
  if (!f) Die(std::string("cannot write ") + out_path);
  std::fwrite(dump.data(), 1, dump.size(), f);
  std::fclose(f);
  std::printf(
      "fa_pjrt_runner: executed b=%d h=%d/%d sq=%d sk=%d d=%d/%d "
      "causal=%d on device; wrote %s\n",
      hdr.b, hdr.h, hdr.hk, hdr.sq, hdr.sk, hdr.d, hdr.dv, hdr.causal,
      out_path);
  return 0;
}
