// lt_runner: native StableHLO inference runner over the PJRT C API.
//
// TPU-native analog of the reference's C++ inference recipes
// (examples/cpp/onnxruntime/main.cpp, examples/cpp/tensorrt/main.cpp):
// instead of ONNX Runtime / TensorRT, this loads any PJRT plugin
// (libaxon_pjrt.so for TPU, or a CPU PJRT plugin), compiles the raw
// StableHLO module written by `lightly_train_tpu.export_stablehlo`
// (<artifact>.mlir + <artifact>.compile_options.pb), feeds a raw float32
// input tensor, and writes each output tensor as raw bytes — no Python in
// the serving path.
//
// Usage:
//   lt_runner <plugin.so> <model.mlir> <compile_options.pb> \
//             <input.bin> <B,H,W,C> <output_prefix>
//
// Input: float32 row-major (B, H, W, C) raw file. Outputs: one
// <output_prefix>.<i>.bin per graph output plus a line on stdout:
//   output <i> dtype=<t> shape=<d0,d1,...> bytes=<n>
//
// Build: make runner   (links only libdl; the PJRT C API is a pure C ABI).

#include <dlfcn.h>
#include <unistd.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdlib>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <deque>
#include <sstream>
#include <string>
#include <vector>

#include "pjrt_c_api.h"

namespace {

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(2);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

void CheckError(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "%s failed: %.*s\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  std::exit(3);
}

void AwaitEvent(const PJRT_Api* api, PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  CheckError(api, api->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  api->PJRT_Event_Destroy(&dargs);
}

const char* DTypeName(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: return "float32";
    case PJRT_Buffer_Type_F16: return "float16";
    case PJRT_Buffer_Type_BF16: return "bfloat16";
    case PJRT_Buffer_Type_S32: return "int32";
    case PJRT_Buffer_Type_S64: return "int64";
    case PJRT_Buffer_Type_PRED: return "bool";
    case PJRT_Buffer_Type_U8: return "uint8";
    default: return "other";
  }
}

size_t DTypeBytes(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32:
    case PJRT_Buffer_Type_S32:
    case PJRT_Buffer_Type_U32: return 4;
    case PJRT_Buffer_Type_F16:
    case PJRT_Buffer_Type_BF16:
    case PJRT_Buffer_Type_S16:
    case PJRT_Buffer_Type_U16: return 2;
    case PJRT_Buffer_Type_S64:
    case PJRT_Buffer_Type_U64:
    case PJRT_Buffer_Type_F64: return 8;
    default: return 1;
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 7 || argc > 9) {
    std::fprintf(
        stderr,
        "usage: %s <plugin.so> <model.mlir> <compile_options.pb> "
        "<input.bin> <B,H,W,C> <output_prefix> [repeat] [warmup]\n",
        argv[0]);
    return 1;
  }
  const int repeat = argc >= 8 ? std::atoi(argv[7]) : 1;
  // Executions excluded from the latency statistics (the first execute is
  // always untimed; `warmup` counts it), matching the Python backends'
  // warmup-exclusion semantics in benchmark_task.py.
  const int warmup = argc == 9 ? std::atoi(argv[8]) : 1;
  const std::string plugin_path = argv[1];
  const std::string mlir = ReadFile(argv[2]);
  const std::string compile_opts = ReadFile(argv[3]);
  const std::string input = ReadFile(argv[4]);
  std::vector<int64_t> dims;
  {
    std::stringstream ss(argv[5]);
    std::string item;
    while (std::getline(ss, item, ',')) dims.push_back(std::stoll(item));
  }
  {
    size_t n_elems = 1;
    for (int64_t d : dims) n_elems *= static_cast<size_t>(d);
    if (input.size() != n_elems * sizeof(float)) {
      std::fprintf(stderr,
                   "input.bin holds %zu bytes but dims imply %zu "
                   "(f32); refusing to read past the buffer\n",
                   input.size(), n_elems * sizeof(float));
      return 1;
    }
  }
  const std::string out_prefix = argv[6];

  void* handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_GLOBAL);
  if (handle == nullptr) {
    std::fprintf(stderr, "dlopen(%s) failed: %s\n", plugin_path.c_str(),
                 dlerror());
    return 2;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (get_api == nullptr) {
    std::fprintf(stderr, "GetPjrtApi not found in %s\n", plugin_path.c_str());
    return 2;
  }
  const PJRT_Api* api = get_api();
  std::fprintf(stderr, "PJRT plugin api version %d.%d\n",
               api->pjrt_api_version.major_version,
               api->pjrt_api_version.minor_version);

  if (api->PJRT_Plugin_Initialize != nullptr) {
    PJRT_Plugin_Initialize_Args init_args;
    std::memset(&init_args, 0, sizeof(init_args));
    init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CheckError(api, api->PJRT_Plugin_Initialize(&init_args),
               "PJRT_Plugin_Initialize");
  }

  // Client create options (PJRT NamedValues). Some plugins require them
  // (the axon TPU relay needs topology/session settings). Format:
  //   LT_RUNNER_OPTIONS="remote_compile=i1,topology=sv5e:1x1x1,..."
  // with 'i' = int64 value, 's' = string value.
  std::vector<PJRT_NamedValue> named_values;
  // deque: pointer-stable growth (a vector reallocation would dangle the
  // c_str() pointers held in named_values).
  std::deque<std::string> option_storage;
  const char* opts_env = std::getenv("LT_RUNNER_OPTIONS");
  std::string opts_str = opts_env ? opts_env : "";
  if (opts_str.empty() && plugin_path.find("axon") != std::string::npos) {
    const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
    std::string topo = std::string(gen ? gen : "v5e") + ":1x1x1";
    opts_str = "remote_compile=i1,local_only=i0,priority=i0,n_slices=i1,"
               "rank=i0,topology=s" + topo +
               ",session_id=slt_runner_" + std::to_string(::getpid());
  }
  {
    std::stringstream ss(opts_str);
    std::string item;
    while (std::getline(ss, item, ',')) {
      auto eq = item.find('=');
      if (eq == std::string::npos || eq + 1 >= item.size()) continue;
      option_storage.push_back(item.substr(0, eq));
      const std::string& name = option_storage.back();
      char kind = item[eq + 1];
      PJRT_NamedValue nv;
      std::memset(&nv, 0, sizeof(nv));
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = name.c_str();
      nv.name_size = name.size();
      if (kind == 'i') {
        nv.type = PJRT_NamedValue_kInt64;
        try {
          nv.int64_value = std::stoll(item.substr(eq + 2));
        } catch (const std::exception&) {
          std::fprintf(stderr, "bad int option '%s'\n", item.c_str());
          return 1;
        }
        nv.value_size = 1;
      } else {
        option_storage.push_back(item.substr(eq + 2));
        const std::string& sval = option_storage.back();
        nv.type = PJRT_NamedValue_kString;
        nv.string_value = sval.c_str();
        nv.value_size = sval.size();
      }
      named_values.push_back(nv);
    }
  }

  PJRT_Client_Create_Args client_args;
  std::memset(&client_args, 0, sizeof(client_args));
  client_args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  client_args.create_options = named_values.data();
  client_args.num_options = named_values.size();
  CheckError(api, api->PJRT_Client_Create(&client_args), "PJRT_Client_Create");
  PJRT_Client* client = client_args.client;

  PJRT_Client_AddressableDevices_Args dev_args;
  std::memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client;
  CheckError(api, api->PJRT_Client_AddressableDevices(&dev_args),
             "PJRT_Client_AddressableDevices");
  if (dev_args.num_addressable_devices == 0) {
    std::fprintf(stderr, "no addressable devices\n");
    return 3;
  }
  PJRT_Device* device = dev_args.addressable_devices[0];

  // ---- compile ----
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir.data());
  program.code_size = mlir.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args compile_args;
  std::memset(&compile_args, 0, sizeof(compile_args));
  compile_args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile_args.client = client;
  compile_args.program = &program;
  compile_args.compile_options = compile_opts.data();
  compile_args.compile_options_size = compile_opts.size();
  CheckError(api, api->PJRT_Client_Compile(&compile_args),
             "PJRT_Client_Compile");
  PJRT_LoadedExecutable* executable = compile_args.executable;
  std::fprintf(stderr, "compiled %zu-byte module\n", mlir.size());

  // ---- input buffer ----
  PJRT_Client_BufferFromHostBuffer_Args buf_args;
  std::memset(&buf_args, 0, sizeof(buf_args));
  buf_args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  buf_args.client = client;
  buf_args.data = input.data();
  buf_args.type = PJRT_Buffer_Type_F32;
  buf_args.dims = dims.data();
  buf_args.num_dims = dims.size();
  buf_args.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  buf_args.device = device;
  CheckError(api, api->PJRT_Client_BufferFromHostBuffer(&buf_args),
             "PJRT_Client_BufferFromHostBuffer");
  AwaitEvent(api, buf_args.done_with_host_buffer, "host buffer transfer");
  PJRT_Buffer* input_buffer = buf_args.buffer;

  // ---- execute ----
  PJRT_ExecuteOptions exec_options;
  std::memset(&exec_options, 0, sizeof(exec_options));
  exec_options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* arg_list[] = {input_buffer};
  PJRT_Buffer* const* arg_lists[] = {arg_list};

  // Query the number of outputs from the executable.
  PJRT_LoadedExecutable_GetExecutable_Args get_exec;
  std::memset(&get_exec, 0, sizeof(get_exec));
  get_exec.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  get_exec.loaded_executable = executable;
  CheckError(api, api->PJRT_LoadedExecutable_GetExecutable(&get_exec),
             "GetExecutable");
  PJRT_Executable_NumOutputs_Args num_out;
  std::memset(&num_out, 0, sizeof(num_out));
  num_out.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  num_out.executable = get_exec.executable;
  CheckError(api, api->PJRT_Executable_NumOutputs(&num_out),
             "PJRT_Executable_NumOutputs");
  size_t n_outputs = num_out.num_outputs;

  std::vector<PJRT_Buffer*> outputs(n_outputs, nullptr);
  PJRT_Buffer** output_list = outputs.data();
  PJRT_Buffer** const output_lists[] = {output_list};
  PJRT_Event* device_complete = nullptr;

  PJRT_LoadedExecutable_Execute_Args exec_args;
  std::memset(&exec_args, 0, sizeof(exec_args));
  exec_args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  exec_args.executable = executable;
  exec_args.options = &exec_options;
  exec_args.argument_lists = arg_lists;
  exec_args.num_devices = 1;
  exec_args.num_args = 1;
  exec_args.output_lists = const_cast<PJRT_Buffer***>(output_lists);
  exec_args.device_complete_events = &device_complete;
  exec_args.execute_device = device;
  CheckError(api, api->PJRT_LoadedExecutable_Execute(&exec_args),
             "PJRT_LoadedExecutable_Execute");
  if (device_complete != nullptr) {
    AwaitEvent(api, device_complete, "execute");
  }

  // Timed repeats (latency benchmarking; prior outputs destroyed each
  // round, the last round's outputs are written below).
  if (repeat > 1) {
    std::vector<double> times_ms;
    for (int r = 1; r < repeat; ++r) {
      for (size_t i = 0; i < n_outputs; ++i) {
        if (outputs[i] == nullptr) continue;
        PJRT_Buffer_Destroy_Args dargs;
        std::memset(&dargs, 0, sizeof(dargs));
        dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
        dargs.buffer = outputs[i];
        api->PJRT_Buffer_Destroy(&dargs);
        outputs[i] = nullptr;
      }
      auto t0 = std::chrono::steady_clock::now();
      device_complete = nullptr;
      CheckError(api, api->PJRT_LoadedExecutable_Execute(&exec_args),
                 "PJRT_LoadedExecutable_Execute (repeat)");
      if (device_complete != nullptr) {
        AwaitEvent(api, device_complete, "execute (repeat)");
      }
      double ms = std::chrono::duration<double, std::milli>(
                      std::chrono::steady_clock::now() - t0)
                      .count();
      if (r >= warmup) times_ms.push_back(ms);
    }
    if (times_ms.empty()) {
      std::fprintf(stderr, "warmup >= repeat: no timed samples\n");
      return 1;
    }
    std::sort(times_ms.begin(), times_ms.end());
    double sum = 0;
    for (double t : times_ms) sum += t;
    std::printf(
        "latency_ms mean=%.3f p50=%.3f p90=%.3f min=%.3f max=%.3f n=%zu\n",
        sum / times_ms.size(), times_ms[times_ms.size() / 2],
        times_ms[static_cast<size_t>(0.9 * times_ms.size())],
        times_ms.front(), times_ms.back(), times_ms.size());
  }

  // ---- read back outputs ----
  for (size_t i = 0; i < n_outputs; ++i) {
    PJRT_Buffer* buf = outputs[i];
    PJRT_Buffer_Dimensions_Args dim_args;
    std::memset(&dim_args, 0, sizeof(dim_args));
    dim_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dim_args.buffer = buf;
    CheckError(api, api->PJRT_Buffer_Dimensions(&dim_args),
               "PJRT_Buffer_Dimensions");
    PJRT_Buffer_ElementType_Args type_args;
    std::memset(&type_args, 0, sizeof(type_args));
    type_args.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    type_args.buffer = buf;
    CheckError(api, api->PJRT_Buffer_ElementType(&type_args),
               "PJRT_Buffer_ElementType");
    size_t n_elems = 1;
    std::string shape_str;
    for (size_t d = 0; d < dim_args.num_dims; ++d) {
      n_elems *= static_cast<size_t>(dim_args.dims[d]);
      if (d) shape_str += ",";
      shape_str += std::to_string(dim_args.dims[d]);
    }
    size_t nbytes = n_elems * DTypeBytes(type_args.type);
    std::vector<char> host(nbytes);

    PJRT_Buffer_ToHostBuffer_Args to_host;
    std::memset(&to_host, 0, sizeof(to_host));
    to_host.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    to_host.src = buf;
    to_host.dst = host.data();
    to_host.dst_size = nbytes;
    CheckError(api, api->PJRT_Buffer_ToHostBuffer(&to_host),
               "PJRT_Buffer_ToHostBuffer");
    AwaitEvent(api, to_host.event, "to host");

    std::string out_path = out_prefix + "." + std::to_string(i) + ".bin";
    std::ofstream f(out_path, std::ios::binary);
    f.write(host.data(), static_cast<std::streamsize>(nbytes));
    std::printf("output %zu dtype=%s shape=%s bytes=%zu file=%s\n", i,
                DTypeName(type_args.type), shape_str.c_str(), nbytes,
                out_path.c_str());
  }
  return 0;
}
