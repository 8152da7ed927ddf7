% supermaTlab.m — MATLAB binding demo for the superman_tpu native engine.
%
% Parity: the reference's supermaTlab.m (loadlibrary/calllib over
% libConnect.so, supermaTlab.m:2-17).  The native library exports the same
% C surface (matlab_calculate_return_int / matlab_calculate_return_double /
% read_calculate_return / connect — see native/perman_cpu.cpp).
%
% Build the library first:  python -m superman_tpu.native.build
% Header for loadlibrary:   bindings/superman_native.h

libpath = fullfile(fileparts(mfilename('fullpath')), ...
                   '..', 'native', 'libsuperman_cpu.so');
hdr = fullfile(fileparts(mfilename('fullpath')), 'superman_native.h');
if ~libisloaded('libsuperman_cpu')
    loadlibrary(libpath, hdr, 'alias', 'libsuperman_cpu');
end

calllib('libsuperman_cpu', 'connect');

% permanent of an integer matrix (algorithm 5 = dense parallel Ryser,
% 16 threads; x/y/z are the estimator knobs for algorithms 1 and 3;
% trailing args are nov (order) and nnz)
A = int32([1 0 1; 1 1 0; 0 1 1]);
% MATLAB stores column-major; the engine expects row-major — pass A'
p = calllib('libsuperman_cpu', 'matlab_calculate_return_int', ...
            A', int32(5), int32(16), ...
            int32(100000), int32(4), int32(5), int32(3), int32(7));
fprintf('permanent (int)    = %.16e\n', p);

B = [0.5 1.25 0; 2 0 1; 0 3 0.75];
p = calllib('libsuperman_cpu', 'matlab_calculate_return_double', ...
            B', int32(5), int32(16), ...
            int32(100000), int32(4), int32(5), int32(3), int32(7));
fprintf('permanent (double) = %.16e\n', p);

unloadlibrary('libsuperman_cpu');
